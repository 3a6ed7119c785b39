"""N-Triples sink/source (sources/ntriples): encoding contract + roundtrip.

Pins: format_lines/parse_lines are exact inverses on adversarial strings
(percent signs, angle brackets, quotes, backslash-n sequences, embedded
newlines); the sharded write is idempotent (content-addressed shards);
and the Ray write -> read_text roundtrip recovers the exact edge set.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

import ray

from ehr_relation_extraction_ray.sources import ntriples


NASTY = pd.DataFrame(
    {
        "subj": ["DRUG:asp irin", "a%b", "x<y>", 'q"q', "plain"],
        "pred": ["STRENGTH", "p p", "%25", "DUR", "REASON"],
        "obj": ["100 mg", "back\\slash", 'quo"te', "line\nbreak", "\\n literal"],
    }
)


def test_encode_decode_inverse():
    lines = ntriples.format_lines(NASTY)
    # one line per row, newline only as the escaped \n
    assert lines.str.contains("\n").sum() == 0
    back = ntriples.parse_lines(
        pa.table({"text": pa.array(lines.tolist())})
    ).to_pandas()
    pd.testing.assert_frame_equal(back, NASTY)


def test_decode_backslash_n_is_not_newline():
    # the encoding of a literal backslash followed by 'n' must NOT decode
    # to a newline (single-pass unescape, the classic sequential-replace bug)
    df = pd.DataFrame({"subj": ["s"], "pred": ["p"], "obj": ["\\n literal"]})
    line = ntriples.format_lines(df).iloc[0]
    assert '"\\\\n literal"' in line
    back = ntriples.parse_lines(pa.table({"text": [line]})).to_pandas()
    assert back["obj"].iloc[0] == "\\n literal"


def test_write_read_roundtrip(ray_session, tmp_path):
    out = str(tmp_path / "nt")
    ds = ray.data.from_pandas(NASTY, override_num_blocks=3)
    ntriples.write_ntriples(ds, out)
    ntriples.write_ntriples(ds, out)  # idempotent: same content-addressed shards
    back = (
        ntriples.read_ntriples(out)
        .map_batches(ntriples.parse_lines, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    want = NASTY.copy()
    # the embedded newline round-trips as one row (escaped on the wire)
    pd.testing.assert_frame_equal(
        back, want.sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    )
