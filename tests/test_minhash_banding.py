"""minhash_band_rows regression: the fused per-doc banding kernel must stay
bit-identical to the compositional shingle_hashes + minhash_signature path.

(A whole-batch concatenated-word-stream variant was prototyped and measured
0.8-0.95x of the per-doc loop on both real sf0.1 docs and synthetic short
docs — see the NOTE in stages/dedupe.py:minhash_band_rows — so the loop is
the intentional shape; this test pins its semantics.)
"""

import numpy as np
import pyarrow as pa

from ehr_relation_extraction_ray.stages import dedupe

CORPUS = [
    "the quick brown fox jumps over the lazy dog again and again",
    "",                                    # empty -> single 0 hash
    "one two",                             # < k words -> single folded hash
    "exactly five words right here now",   # == k+1 words
    "dup dup dup dup dup dup dup dup",     # repeated shingles -> distinct
    "Unicode wörds ärê fîne tóo ünder the hood everywhere always",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    "   leading and   trailing   whitespace   collapses    like split ",
    "single",                              # one word
    "the quick brown fox jumps over the lazy dog again and again",  # dup doc
]


def test_minhash_band_rows_matches_compositional_reference():
    num_perm, bands = 64, 16
    batch = pa.table(
        {"doc_id": [f"d{i}" for i in range(len(CORPUS))], "text": CORPUS}
    )
    out = dedupe.minhash_band_rows(batch, num_perm, bands, "text", "doc_id")

    a, b = dedupe._minhash_params(num_perm)
    rpb = num_perm // bands
    P = np.uint64(1099511628211)
    with np.errstate(over="ignore"):
        powers = P ** np.arange(rpb, dtype=np.uint64)
        want = []
        for text in CORPUS:
            sig = dedupe.minhash_signature(dedupe.shingle_hashes(text), a, b)
            want.append(
                (sig.reshape(bands, rpb) * powers[None, :]).sum(
                    axis=1, dtype=np.uint64
                )
            )
    want_hs = (np.stack(want) & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
    got = out.to_pandas()
    got_hs = got["band_hash"].to_numpy().reshape(len(CORPUS), bands)
    np.testing.assert_array_equal(got_hs, want_hs)
    assert list(got["band"][:bands]) == list(range(bands))
    # identical docs must collide on every band
    np.testing.assert_array_equal(got_hs[0], got_hs[-1])


def test_minhash_band_rows_zero_rows():
    batch = pa.table(
        {"doc_id": pa.array([], pa.string()), "text": pa.array([], pa.string())}
    )
    out = dedupe.minhash_band_rows(batch, 64, 16, "text", "doc_id")
    assert out.num_rows == 0
