"""BGP (basic-graph-pattern) matcher vs a brute-force nested-loop oracle."""

import itertools

import pandas as pd
import pytest
import ray.data

from ehr_relation_extraction_ray.stages import bgp


def _brute_force(edges, patterns):
    """Nested-loop SPARQL BGP over a list of (s, p, o) tuples; DISTINCT."""
    edges = sorted(set(edges))
    results = [dict()]
    for pat in patterns:
        nxt = []
        for binding in results:
            for s, p, o in edges:
                b = dict(binding)
                ok = True
                for term, val in zip(pat, (s, p, o)):
                    if term.startswith("?"):
                        v = term[1:]
                        if v in b and b[v] != val:
                            ok = False
                            break
                        b[v] = val
                    elif term != val:
                        ok = False
                        break
                if ok:
                    nxt.append(b)
        results = nxt
    out_vars = []
    for pat in patterns:
        for term in pat:
            if term.startswith("?") and term[1:] not in out_vars:
                out_vars.append(term[1:])
    rows = sorted({tuple(b[v] for v in out_vars) for b in results})
    return pd.DataFrame(rows, columns=out_vars)


def _ds(edges):
    df = pd.DataFrame(edges, columns=["subj", "pred", "obj"])
    return ray.data.from_pandas(df)


def _run(edges, patterns):
    out = bgp.bgp_match(_ds(edges), patterns).to_pandas()
    return out.sort_values(list(out.columns)).reset_index(drop=True)


EDGES = [
    ("a", "knows", "b"),
    ("b", "knows", "c"),
    ("b", "knows", "d"),
    ("c", "knows", "a"),
    ("a", "type", "person"),
    ("b", "type", "person"),
    ("c", "type", "bot"),
    ("d", "type", "person"),
    ("a", "likes", "a"),
    ("c", "likes", "c"),
    ("a", "knows", "b"),  # duplicate occurrence — must not duplicate bindings
]


@pytest.mark.parametrize(
    "patterns",
    [
        # 2-hop chain
        [("?x", "knows", "?y"), ("?y", "knows", "?z")],
        # chain + type constraint on the middle node
        [
            ("?x", "knows", "?y"),
            ("?y", "knows", "?z"),
            ("?y", "type", "person"),
        ],
        # constant subject
        [("a", "knows", "?y"), ("?y", "type", "?t")],
        # repeated variable inside one pattern (self-loop)
        [("?x", "likes", "?x"), ("?x", "type", "?t")],
        # triangle
        [
            ("?x", "knows", "?y"),
            ("?y", "knows", "?z"),
            ("?z", "knows", "?x"),
        ],
        # single fully-variable pattern
        [("?s", "?p", "?o")],
    ],
)
def test_bgp_matches_brute_force(patterns):
    got = _run(EDGES, patterns)
    want = _brute_force(EDGES, patterns)
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))
    assert not got.duplicated().any()


def test_bgp_reorders_disconnected_prefix():
    # given in an order where pattern 2 shares nothing with pattern 1
    # until pattern 3 bridges them, the greedy planner must still find a
    # connected order (it starts from the most-constant pattern).
    patterns = [
        ("?x", "knows", "?y"),
        ("?z", "type", "bot"),
        ("?y", "knows", "?z"),
    ]
    got = _run(EDGES, patterns)
    want = _brute_force(EDGES, patterns)
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))


def test_bgp_rejects_cartesian():
    with pytest.raises(ValueError, match="disconnected"):
        bgp.bgp_match(
            _ds(EDGES), [("?x", "knows", "?y"), ("?a", "type", "?b")]
        )


def test_bgp_rejects_degenerate():
    with pytest.raises(ValueError):
        bgp.bgp_match(_ds(EDGES), [])
    with pytest.raises(ValueError):
        bgp.bgp_match(_ds(EDGES), [("a", "knows", "b")])


def test_bgp_empty_result_keeps_schema():
    out = bgp.bgp_match(
        _ds(EDGES), [("?x", "knows", "?y"), ("?x", "type", "ghost")]
    )
    # Ray's to_pandas() drops columns on a zero-block dataset; the
    # schema on the Dataset itself is the contract
    assert out.schema().names == ["x", "y"]
    assert out.count() == 0


def test_bgp_random_graph_property():
    # a denser random-ish graph exercises multi-partition joins
    nodes = [f"n{i}" for i in range(12)]
    edges = []
    for i in range(40):
        a, b, c = (7 * i + 3) % 12, (5 * i + 1) % 12, (11 * i + 2) % 12
        edges.append((nodes[a], "knows", nodes[b]))
        edges.append((nodes[b], "likes", nodes[c]))
    edges += [(n, "type", "person" if i % 3 else "bot") for i, n in enumerate(nodes)]
    patterns = [
        ("?x", "knows", "?y"),
        ("?y", "likes", "?z"),
        ("?z", "type", "person"),
    ]
    got = _run(edges, patterns)
    want = _brute_force(edges, patterns)
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))
