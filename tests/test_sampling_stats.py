"""Statistical checks of episodic-replay sampling (uniform over a group's
transitions, length-weighted across trajectories — matching the reference's
flat `torch.randint` over the group's rows, simple_replay.py:150-153)."""

import jax
import jax.numpy as jnp
import numpy as np

from ddiffpg_tpu.replay import episodic as ep


def test_uniform_over_transitions():
    S, L, E, D, A, G = 16, 8, 4, 2, 2, 2
    buf = ep.EpisodicReplay.create(S, L, E, D, A, G)
    # hand-craft three trajectories with very different lengths
    lengths = {0: 8, 1: 2, 2: 6}
    length = np.zeros(S, np.int32)
    traj_id = np.full(S, -1, np.int32)
    obs = np.zeros((S, L + 1, D), np.float32)
    for s, ln in lengths.items():
        length[s] = ln
        traj_id[s] = s
        obs[s, :, 0] = s  # slot id marker
    gm = np.zeros((G, S), bool)
    gm[0, list(lengths)] = True
    buf = buf._replace(length=jnp.asarray(length),
                       traj_id=jnp.asarray(traj_id),
                       obs=jnp.asarray(obs),
                       group_mask=jnp.asarray(gm))

    N = 4000
    gb = ep.sample_group(buf, jax.random.PRNGKey(0), 0, N, mix_temp=False)
    slots = np.asarray(gb.slot)
    total = sum(lengths.values())
    for s, ln in lengths.items():
        frac = (slots == s).mean()
        assert abs(frac - ln / total) < 0.04, (s, frac, ln / total)
    # steps within each trajectory stay in range and cover it
    for s, ln in lengths.items():
        st = np.asarray(gb.step)[slots == s]
        assert st.max() < ln and st.min() >= 0
        assert len(np.unique(st)) == ln


def test_temp_mix_ratio():
    S, L, E, D, A, G = 16, 8, 4, 2, 2, 2
    buf = ep.EpisodicReplay.create(S, L, E, D, A, G)
    # one stored trajectory of 4 transitions + 12 in-flight transitions
    length = np.zeros(S, np.int32)
    length[0] = 4
    traj_id = np.full(S, -1, np.int32)
    traj_id[0] = 0
    gm = np.zeros((G, S), bool)
    gm[0, 0] = True
    buf = buf._replace(length=jnp.asarray(length),
                       traj_id=jnp.asarray(traj_id),
                       group_mask=jnp.asarray(gm),
                       tmp_len=jnp.asarray([3, 3, 3, 3], jnp.int32))
    gb = ep.sample_group(buf, jax.random.PRNGKey(1), 0, 4000, mix_temp=True)
    frac_buf = float(np.asarray(gb.from_buffer).mean())
    assert abs(frac_buf - 4 / 16) < 0.04  # 4 stored vs 12 temp transitions
