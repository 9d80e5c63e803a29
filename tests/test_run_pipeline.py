"""tools/run_pipeline.py — the `ray job submit` entrypoint — end to end.

Runs the real CLI in subprocesses (its own Ray sessions, like a Jobs
API submission) against sf0.001: fresh write, then a resume that must
skip every finished partition and reproduce the identical manifest.
"""

import json
import subprocess
import sys


def _run(out_dir: str) -> dict:
    p = subprocess.run(
        [sys.executable, "/root/repo/tools/run_pipeline.py",
         "--pipeline", "token_count",
         "--sf-dir", "/root/testdata/sf0.001",
         "--out", out_dir, "--partitions", "8"],
        capture_output=True, text=True, check=True, timeout=300)
    return json.loads(p.stdout.strip().splitlines()[-1])


def test_job_entrypoint_write_and_resume(tmp_path):
    out = str(tmp_path / "job_out")
    first = _run(out)
    assert first["rows"] == 500
    assert first["partitions"] == 8
    assert first["skipped_resume"] == 0

    from greenex_py_ray import lineage
    m1 = lineage.read_manifest(out)

    second = _run(out)
    assert second["skipped_resume"] == 8     # everything skipped
    assert second["rows"] == 500
    m2 = lineage.read_manifest(out)
    assert [r["checksum"] for r in m1] == [r["checksum"] for r in m2]


def test_job_entrypoint_rejects_unknown_pipeline(tmp_path):
    p = subprocess.run(
        [sys.executable, "/root/repo/tools/run_pipeline.py",
         "--pipeline", "nope", "--out", str(tmp_path / "x")],
        capture_output=True, text=True, timeout=300)
    assert p.returncode != 0
    assert "unknown pipeline" in p.stderr
