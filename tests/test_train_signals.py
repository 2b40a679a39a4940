"""Signal-driven checkpointing in the training entry (failure recovery).

SURVEY §5 failure detection/recovery: periodic checkpoints are light
(replay excluded), so an external supervisor needs a way to capture the
FULL train state before stopping a run. train.py installs:
  * SIGUSR1 -> save a full checkpoint at the next loop top, keep running
  * SIGTERM -> save a full checkpoint, then exit cleanly
(The reference has no counterpart; its checkpoints are weights-only,
utils/model_util.py.)
"""

import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _wait_for(predicate, timeout, what):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if predicate():
            return
        time.sleep(1.0)
    raise AssertionError(f"timed out waiting for {what}")


def test_sigusr1_full_ckpt_then_sigterm_stop(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    args = [
        sys.executable, os.path.join(REPO, "train.py"),
        "algo=ddiffpg", "env.name=pointmaze-v1", "device=cpu",
        "num_envs=8", "eval_num_envs=4", "max_step=1000000",
        f"logdir={tmp_path}", "run_name=sig", "eval_freq=10000",
        "algo.batch_size=64", "algo.warm_up=10", "algo.update_times=1",
        "algo.memory_size=32", "diffusion.update_times=2",
        "diffusion.diffusion_iter=2", "intrinsic.L=2",
    ]
    proc = subprocess.Popen(args, env=env, cwd=REPO,
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            text=True)
    run_dir = tmp_path / "sig"
    try:
        # wait for the train loop to actually start stepping
        _wait_for(lambda: (run_dir / "metrics.jsonl").exists()
                  and (run_dir / "metrics.jsonl").stat().st_size > 0,
                  600, "first metrics record")

        proc.send_signal(signal.SIGUSR1)
        _wait_for(lambda: list(run_dir.glob("ckpt_*_full.pkl")),
                  300, "SIGUSR1 full checkpoint")
        assert proc.poll() is None, "SIGUSR1 must not stop the run"

        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=300)
        assert proc.returncode == 0
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()
    # SIGTERM produced a second full checkpoint before exiting
    full = sorted(run_dir.glob("ckpt_*_full.pkl"))
    assert len(full) >= 2

    # the full checkpoint restores replay state (light ones skip it)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from ddiffpg_tpu import config as C
    from ddiffpg_tpu.agents import make_agent
    from ddiffpg_tpu.envs import make
    from ddiffpg_tpu.utils import checkpoint as ckpt
    from tests.test_agents import small_cfg

    cfg = small_cfg("ddiffpg", **{"algo.warm_up": 10,
                                  "algo.update_times": 1,
                                  "diffusion.update_times": 2,
                                  "diffusion.diffusion_iter": 2,
                                  "intrinsic.L": 2})
    agent = make_agent("DDiffPG", make(cfg.env.name, num_envs=8), cfg)
    ts = agent.init(jax.random.PRNGKey(0))
    restored, meta = ckpt.load(str(full[-1]), ts)
    assert not meta.get("light")
    # full checkpoints carry the replay (light ones skip it): the in-flight
    # per-env episode buffers fill from the very first warmup step, so they
    # must be non-zero even if no episode has finished yet
    import numpy as np

    assert int(np.asarray(restored.replay.tmp_len).sum()) > 0
    assert int(np.asarray(restored.global_step)) > 0
