"""tools/archive_run.py — durable-evidence archiver.

Workspaces are wiped between rounds; the archiver must capture the
training curve (gzipped), the config, and only the LATEST plot of each
family, and write a final-metrics summary."""
import gzip
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.archive_run import archive  # noqa: E402


def test_archive_run(tmp_path, monkeypatch):
    import tools.archive_run as ar

    run = tmp_path / "runs" / "demo_run"
    run.mkdir(parents=True)
    rows = [{"step": 100, "train/critic_loss": 1.0},
            {"step": 200, "eval/success_rate": 0.5,
             "eval/success_goal1": 1.0, "eval/success_goal2": 0.0}]
    (run / "metrics.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n")
    (run / "config.json").write_text('{"seed": 11}')
    for name in ["eval_map_100.png", "eval_map_200.png", "cluster_100.png"]:
        (run / name).write_bytes(b"png")

    monkeypatch.setattr(ar, "REPO", tmp_path)
    out = archive(run)

    assert out == tmp_path / "runs_archive" / "demo_run"
    with gzip.open(out / "metrics.jsonl.gz", "rt") as f:
        assert [json.loads(l)["step"] for l in f] == [100, 200]
    assert json.loads((out / "config.json").read_text()) == {"seed": 11}
    # only the newest eval_map survives; the sole cluster plot survives
    pngs = sorted(p.name for p in out.glob("*.png"))
    assert pngs == ["cluster_100.png", "eval_map_200.png"]
    summary = json.loads((out / "final_metrics.json").read_text())
    assert summary["eval/success_rate"] == 0.5
    assert summary["eval/success_goal2"] == 0.0
    assert summary["step"] == 200
