"""Model zoo shape / semantics tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ddiffpg_tpu.models import get_model
from ddiffpg_tpu.models.mlp import (
    DoubleQ, DistributionalDoubleQ, DistributionalEnsembleQ, DynamicModel,
    RNDModel, TanhDiagGaussianMLPPolicy, TanhMLPPolicy,
)
from ddiffpg_tpu.models.diffusion import DiffusionPolicy
from ddiffpg_tpu.models.baseline_diffusion import Diffusion, Consistency

KEY = jax.random.PRNGKey(0)
OBS = jnp.ones((8, 29))
ACT = jnp.ones((8, 8)) * 0.1


def test_registry():
    assert get_model("DistributionalDoubleQ") is DistributionalDoubleQ
    assert get_model("DiffusionPolicy") is DiffusionPolicy


def test_tanh_policy_bounds():
    net = TanhMLPPolicy(action_dim=8)
    params = net.init(KEY, OBS)
    out = net.apply(params, OBS)
    assert out.shape == (8, 8)
    assert float(jnp.abs(out).max()) <= 1.0


def test_double_q():
    net = DoubleQ()
    params = net.init(KEY, OBS, ACT)
    q1, q2 = net.apply(params, OBS, ACT)
    assert q1.shape == q2.shape == (8, 1)
    qmin = net.apply(params, OBS, ACT, method=DoubleQ.q_min)
    np.testing.assert_allclose(qmin, jnp.minimum(q1, q2), rtol=1e-6)


def test_distributional_double_q_simplex():
    net = DistributionalDoubleQ(v_min=0.0, v_max=5.0, num_atoms=51)
    params = net.init(KEY, OBS, ACT)
    q1, q2 = net.apply(params, OBS, ACT)
    assert q1.shape == (8, 51)
    np.testing.assert_allclose(q1.sum(-1), 1.0, atol=1e-5)
    qmin = net.apply(params, OBS, ACT, method=DistributionalDoubleQ.q_min)
    assert qmin.shape == (8,)
    assert float(qmin.min()) >= 0.0 and float(qmin.max()) <= 5.0


def test_ensemble_q_and_dynamics():
    net = DistributionalEnsembleQ(n_ensemble=3)
    params = net.init(KEY, OBS, ACT)
    qs = net.apply(params, OBS, ACT)
    assert qs.shape == (3, 8, 51)

    dyn = DynamicModel(obs_dim=29, n_ensemble=3)
    p = dyn.init(KEY, OBS, ACT)
    r = dyn.apply(p, OBS, ACT, method=DynamicModel.disagreement_reward)
    assert r.shape == (8,) and float(r.min()) >= 0.0


def test_rnd_target_frozen():
    net = RNDModel()
    params = net.init(KEY, OBS)

    def loss(p):
        pred, tgt = net.apply(p, OBS)
        return jnp.mean((pred - tgt) ** 2)

    grads = jax.grad(loss)(params)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    for path, g in flat:
        name = "/".join(str(p) for p in path)
        norm = float(jnp.abs(g).sum())
        if "tgt_" in name:
            assert norm == 0.0, name
        if "pred_" in name:
            assert norm > 0.0, name


def test_sac_policy_logprob():
    net = TanhDiagGaussianMLPPolicy(action_dim=8)
    params = net.init(KEY, OBS)
    mu, log_std = net.apply(params, OBS)
    a, lp = TanhDiagGaussianMLPPolicy.sample_logprob(KEY, mu, log_std)
    assert a.shape == (8, 8) and lp.shape == (8, 1)
    assert float(jnp.abs(a).max()) < 1.0
    # verify against naive change-of-variables on one element
    x = jnp.arctanh(jnp.clip(a, -1 + 1e-6, 1 - 1e-6))
    std = jnp.exp(log_std)
    base = -0.5 * (((x - mu) / std) ** 2 + 2 * log_std + np.log(2 * np.pi))
    naive = (base - jnp.log(1 - a**2 + 1e-6)).sum(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(naive), atol=1e-2)


def test_diffusion_policy_act_and_loss():
    net = DiffusionPolicy(action_dim=8, diffusion_iter=5)
    cond = jnp.ones((8, 34))
    params = net.init(KEY, jnp.zeros((8, 8)), jnp.zeros((8,)), cond)
    act = net.apply(params, KEY, cond, method=DiffusionPolicy.act)
    assert act.shape == (8, 8)
    assert bool(jnp.all(jnp.isfinite(act)))

    loss = net.apply(params, KEY, cond, act, method=DiffusionPolicy.loss)
    assert loss.shape == ()
    g = jax.grad(lambda p: net.apply(p, KEY, cond, act,
                                     method=DiffusionPolicy.loss))(params)
    gnorm = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert gnorm > 0.0


def test_baseline_diffusion_and_consistency():
    st = jnp.ones((4, 29))
    dif = Diffusion(action_dim=8, n_timesteps=5, beta_schedule="vp")
    p = dif.init(KEY, jnp.zeros((4, 8)), jnp.zeros((4,)), st)
    a = dif.apply(p, st, KEY, method=Diffusion.sample)
    assert a.shape == (4, 8) and float(jnp.abs(a).max()) <= 1.0
    l = dif.apply(p, KEY, st, a, method=Diffusion.loss)
    assert np.isfinite(float(l))

    con = Consistency(action_dim=8)
    p2 = con.init(KEY, st, KEY)
    a2 = con.apply(p2, st, KEY)
    assert a2.shape == (4, 8) and float(jnp.abs(a2).max()) <= 1.0
    l2 = con.apply(p2, KEY, st, a2, method=Consistency.loss)
    assert np.isfinite(float(l2))


def test_intrinsic_noveld():
    from ddiffpg_tpu.intrinsic import IntrinsicModule

    mod = IntrinsicModule(obs_dim=29, kind="noveld", pos_dim=2, L=10)
    st = mod.init(KEY)
    obs = jax.random.normal(KEY, (16, 29))
    nobs = obs + 0.1
    r, st2 = mod.compute_reward(st, obs, nobs)
    assert r.shape == (16, 1)
    assert float(r.min()) >= 0.0  # NovelD is clamped at zero
    st3, loss, gn = mod.update(st2, obs)
    assert np.isfinite(float(loss)) and float(gn) > 0
    # predictor training reduces loss on repeated data
    for _ in range(50):
        st3, loss2, _ = mod.update(st3, obs)
    assert float(loss2) < float(loss)


def test_intrinsic_depth_scale():
    """depth_scale multiplies NovelD by (1 + ds * ||next_pos||) exactly."""
    from ddiffpg_tpu.intrinsic import IntrinsicModule

    flat = IntrinsicModule(obs_dim=29, kind="noveld", pos_dim=2, L=10)
    deep = IntrinsicModule(obs_dim=29, kind="noveld", pos_dim=2, L=10,
                           depth_scale=0.1)
    st_f, st_d = flat.init(KEY), deep.init(KEY)
    obs = jax.random.normal(KEY, (16, 29))
    nobs = obs + 0.1
    r_f, _ = flat.compute_reward(st_f, obs, nobs)
    r_d, _ = deep.compute_reward(st_d, obs, nobs)
    depth = jnp.linalg.norm(nobs[:, :2], axis=-1)[:, None]
    np.testing.assert_allclose(np.asarray(r_d),
                               np.asarray(r_f * (1 + 0.1 * depth)), rtol=1e-5)
    assert float(r_d.min()) >= 0.0
