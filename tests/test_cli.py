"""CLI surface (python -m ehr_relation_extraction_ray)."""

import json
import subprocess
import sys


def _run(args, input_text=None):
    return subprocess.run(
        [sys.executable, "-m", "ehr_relation_extraction_ray", *args],
        capture_output=True,
        text=True,
        input=input_text,
        cwd="/root/repo",
        timeout=240,
    )


def test_annotate_json_no_cluster():
    text = (
        "patient took aspirin 100 mg twice daily for chronic back pain "
        "and later developed nausea . "
    ) * 20
    r = _run(["annotate", "--text", text])
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["mentions"] and out["triples"]
    assert {m["ent_type"] for m in out["mentions"]} >= {"Drug"}


def test_annotate_html():
    r = _run(["annotate", "--text", "took aspirin daily", "--html"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "<span" in r.stdout


def test_run_writes_triples(tmp_path):
    from ehr_relation_extraction_ray import synth

    sf = synth.transcripts_path("/root/testdata/sf0.001")
    out = tmp_path / "cli"
    r = _run(["run", "--input", sf, "--out", str(out)])
    assert r.returncode == 0, r.stderr[-2000:]
    import glob

    import pyarrow.parquet as pq

    files = glob.glob(str(out / "triples" / "*.parquet"))
    assert sum(pq.read_metadata(f).num_rows for f in files) == 5758
