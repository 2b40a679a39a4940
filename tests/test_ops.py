"""Unit tests for the pure math ops against closed forms / naive loops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddiffpg_tpu.ops import ddpm, distributional, nstep, noise, running_stats as rs
from ddiffpg_tpu.ops.embedding import add_embedding, append_embedding
from ddiffpg_tpu.ops.posenc import posenc, posenc_dim
from ddiffpg_tpu.ops import schedules


class TestDDPM:
    def test_squaredcos_betas_closed_form(self):
        T = 5
        betas = ddpm.squaredcos_cap_v2_betas(T)

        def ab(t):
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2

        for i in range(T):
            expect = min(1 - ab((i + 1) / T) / ab(i / T), 0.999)
            assert abs(betas[i] - expect) < 1e-12

    def test_add_noise_matches_formula(self):
        tables = ddpm.make_tables(5)
        x0 = jnp.ones((4, 3))
        eps = jnp.full((4, 3), 0.5)
        t = jnp.array([0, 1, 2, 4])
        out = ddpm.add_noise(tables, x0, eps, t)
        acp = np.asarray(tables.alphas_cumprod)
        for i, ti in enumerate([0, 1, 2, 4]):
            expect = np.sqrt(acp[ti]) * 1.0 + np.sqrt(1 - acp[ti]) * 0.5
            np.testing.assert_allclose(out[i], expect, rtol=1e-5)

    def test_step_t0_deterministic_and_clipped(self):
        tables = ddpm.make_tables(5)
        x = jnp.array([[5.0, -5.0]])
        eps = jnp.zeros((1, 2))
        big_noise = jnp.full((1, 2), 100.0)
        out = ddpm.step(tables, eps, jnp.asarray(0), x, big_noise)
        # at t=0: acp_prev=1 -> mean = x0 (clipped), no noise added
        np.testing.assert_allclose(out, [[1.0, -1.0]], atol=1e-5)

    def test_step_posterior_mean(self):
        tables = ddpm.make_tables(50, "linear")
        t = 10
        x = jnp.array([[0.3]])
        eps = jnp.array([[0.1]])
        out = ddpm.step(tables, eps, jnp.asarray(t), x, jnp.zeros((1, 1)))
        acp = np.asarray(tables.alphas_cumprod)
        beta = np.asarray(tables.betas)[t]
        alpha = 1 - beta
        x0 = (0.3 - np.sqrt(1 - acp[t]) * 0.1) / np.sqrt(acp[t])
        x0 = np.clip(x0, -1, 1)
        mean = (np.sqrt(acp[t - 1]) * beta / (1 - acp[t]) * x0
                + np.sqrt(alpha) * (1 - acp[t - 1]) / (1 - acp[t]) * 0.3)
        np.testing.assert_allclose(out[0, 0], mean, rtol=1e-4)

    def test_reverse_scan_in_bounds(self):
        tables = ddpm.make_tables(5)
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (16, 4)) * 3
        out = ddpm.reverse_scan(tables, lambda x, t: jnp.zeros_like(x), key, x)
        assert jnp.all(jnp.isfinite(out))


class TestProjection:
    def _naive(self, next_dist, reward, done, gamma, v_min, v_max, A, support):
        B = reward.shape[0]
        dz = (v_max - v_min) / (A - 1)
        proj = np.zeros_like(next_dist)
        for b in range(B):
            for j in range(A):
                tz = reward[b, 0] + (1 - done[b, 0]) * gamma * support[j]
                tz = np.clip(tz, v_min, v_max)
                bj = (tz - v_min) / dz
                l, u = int(np.floor(bj)), int(np.ceil(bj))
                if l == u:
                    if u > 0:
                        l -= 1
                    elif l < A - 1:
                        u += 1
                proj[b, l] += next_dist[b, j] * (u - bj)
                proj[b, u] += next_dist[b, j] * (bj - l)
        return proj

    def test_matches_naive(self):
        rng = np.random.RandomState(0)
        B, A = 7, 51
        v_min, v_max, gamma = 0.0, 5.0, 0.99
        support = np.linspace(v_min, v_max, A)
        logits = rng.randn(B, A)
        dist = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
        reward = rng.uniform(-1, 11, (B, 1))
        done = (rng.rand(B, 1) < 0.3).astype(np.float32)
        got = distributional.projection(
            jnp.asarray(dist, jnp.float32), jnp.asarray(reward, jnp.float32),
            jnp.asarray(done), gamma, v_min, v_max, A,
            jnp.asarray(support, jnp.float32))
        want = self._naive(dist, reward, done, gamma, v_min, v_max, A, support)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got).sum(-1), 1.0, atol=1e-5)

    def test_bce_matches_torch_formula(self):
        p = np.clip(np.random.RandomState(1).rand(5, 3), 1e-6, 1 - 1e-6)
        t = np.random.RandomState(2).rand(5, 3)
        got = distributional.binary_cross_entropy(jnp.asarray(p, jnp.float32),
                                                  jnp.asarray(t, jnp.float32))
        want = -(t * np.log(p) + (1 - t) * np.log(1 - p)).mean()
        assert abs(float(got) - want) < 1e-5


class TestRunningMeanStd:
    def test_matches_numpy(self):
        rng = np.random.RandomState(3)
        state = rs.RunningMeanStd.create((4,))
        chunks = [rng.randn(32, 4) * (i + 1) + i for i in range(5)]
        for c in chunks:
            state = rs.update(state, jnp.asarray(c, jnp.float32))
        allx = np.concatenate(chunks)
        np.testing.assert_allclose(state.mean, allx.mean(0), rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(state.var, allx.var(0), rtol=2e-2)
        z = rs.normalize(state, jnp.asarray(allx, jnp.float32))
        assert abs(float(z.mean())) < 1e-2

    def test_update_rms_large_offset_channels(self):
        """Regression (advisor r2): E[x^2]-E[x]^2 in f32 cancels
        catastrophically when |mean| >> std (e.g. an absolute-position obs
        channel at 1e4 with unit noise), zeroing the variance and making
        normalize() divide by ~sqrt(eps). The Chan central-moment form
        must preserve the variance."""
        from ddiffpg_tpu.agents import base

        rng = np.random.RandomState(0)
        x = (rng.randn(256, 3) + np.asarray([1e5, -2e5, 0.0])).astype(
            np.float32)
        state = rs.RunningMeanStd.create((3,))
        for _ in range(4):
            state = base.update_rms(state, jnp.asarray(x))

        # float64 reference of the same fold sequence (prior included)
        ref = rs.RunningMeanStd(np.zeros(3), np.ones(3), np.asarray(1e-4))
        for _ in range(4):
            ref = rs.update_from_stats(
                ref, x.astype(np.float64).mean(0),
                x.astype(np.float64).var(0), 256)
        np.testing.assert_allclose(np.asarray(state.var),
                                   np.asarray(ref.var), rtol=0.05)
        z = np.asarray(rs.normalize(state, jnp.asarray(x)))
        assert np.abs(z - z.mean(0)).max() < 10.0


class TestNStep:
    def test_fold_window_early_done(self):
        E, n = 3, 4
        reward = np.zeros((E, n, 1), np.float32)
        done = np.zeros((E, n, 1), bool)
        next_obs = np.arange(E * n * 2, dtype=np.float32).reshape(E, n, 2)
        reward[0, :, 0] = [1, 1, 1, 1]          # no done
        reward[1, :, 0] = [1, 2, 3, 4]
        done[1, 1, 0] = True                    # done at step 1
        reward[2, :, 0] = [5, 0, 0, 0]
        done[2, 0, 0] = True                    # done immediately
        g = 0.9
        r, nobs, dn = nstep.fold_window(jnp.asarray(reward), jnp.asarray(done),
                                        jnp.asarray(next_obs), g)
        np.testing.assert_allclose(r[0, 0], 1 + g + g**2 + g**3, rtol=1e-6)
        np.testing.assert_allclose(r[1, 0], 1 + 2 * g, rtol=1e-6)
        np.testing.assert_allclose(r[2, 0], 5, rtol=1e-6)
        assert not bool(dn[0, 0]) and bool(dn[1, 0]) and bool(dn[2, 0])
        np.testing.assert_allclose(nobs[0], next_obs[0, -1])
        np.testing.assert_allclose(nobs[1], next_obs[1, 1])
        np.testing.assert_allclose(nobs[2], next_obs[2, 0])

    def test_push_validity(self):
        st = nstep.NStepState.create(2, 3, 4, 2)
        obs = jnp.ones((2, 4))
        act = jnp.ones((2, 2))
        r = jnp.ones((2, 1))
        d = jnp.zeros((2, 1), bool)
        for i in range(3):
            st, out = nstep.push(st, obs, act, r, d, obs, 0.99)
            assert bool(out[-1]) == (i == 2)


class TestEmbedding:
    def test_p_zero_all_explore(self):
        key = jax.random.PRNGKey(0)
        state = jnp.zeros((8, 3))
        emb = jnp.full((5,), 2.0)
        out = add_embedding(key, state, emb, p=0.0)
        assert out.shape == (8, 8)
        np.testing.assert_allclose(out[:, 3:], 2.0)

    def test_no_modes_zero_fraction(self):
        key = jax.random.PRNGKey(1)
        state = jnp.zeros((100, 2))
        emb = jnp.ones((4,))
        out = add_embedding(key, state, emb, p=0.37)
        zeros = int((out[:, 2:].sum(-1) == 0).sum())
        assert zeros == 37

    def test_modes_partition(self):
        key = jax.random.PRNGKey(2)
        state = jnp.zeros((10, 2))
        emb = jnp.zeros((2,))
        modes = jnp.array([[1.0, 1.0], [2.0, 2.0], [3.0, 3.0]])
        out = add_embedding(key, state, emb, p=0.7, modes=modes, num_modes=3)
        # s = 7, sizes = [3, 2, 2] (remainder to mode 0), rows 7..9 explore
        tags = np.asarray(out[:, 2])
        np.testing.assert_allclose(tags[:3], 1.0)
        np.testing.assert_allclose(tags[3:5], 2.0)
        np.testing.assert_allclose(tags[5:7], 3.0)
        np.testing.assert_allclose(tags[7:], 0.0)

    def test_append(self):
        out = append_embedding(jnp.zeros((4, 2)), jnp.array([1.0, 2.0]))
        np.testing.assert_allclose(out[:, 2:], [[1, 2]] * 4)


class TestPosenc:
    def test_dims_and_values(self):
        x = jnp.array([[0.5, -0.25]])
        L = 10
        out = posenc(x, L)
        assert out.shape == (1, posenc_dim(2, L)) == (1, 42)
        np.testing.assert_allclose(out[0, :2], [0.5, -0.25])
        np.testing.assert_allclose(out[0, 2:4], np.sin([0.5, -0.25]), rtol=1e-5)
        np.testing.assert_allclose(out[0, 4:6], np.cos([0.5, -0.25]), rtol=1e-5)
        np.testing.assert_allclose(out[0, 6:8], np.sin([1.0, -0.5]), rtol=1e-5)


class TestNoiseAndSchedules:
    def test_mixed_noise_std_gradient(self):
        key = jax.random.PRNGKey(0)
        x = jnp.zeros((4096, 2))
        out = noise.add_mixed_normal_noise(key, x, std_min=0.05, std_max=0.6)
        stds = np.asarray(out).std(axis=1)
        assert stds[:100].mean() < stds[-100:].mean()

    def test_bounds(self):
        key = jax.random.PRNGKey(0)
        x = jnp.zeros((1000, 2))
        out = noise.add_normal_noise(key, x, 5.0, noise_bounds=(-0.2, 0.2),
                                     out_bounds=(-0.1, 0.1))
        assert float(jnp.abs(out).max()) <= 0.1 + 1e-6

    def test_schedules(self):
        assert float(schedules.linear(0, 1.0, 0.0, 10)) == 1.0
        assert float(schedules.linear(10, 1.0, 0.0, 10)) == 0.0
        assert float(schedules.linear(20, 1.0, 0.0, 10)) == 0.0
        np.testing.assert_allclose(float(schedules.exponential(2, 1.0, 0.5)), 0.25)
        assert 0.0 <= float(schedules.tanh(5, 0, 10)) <= 1.0
