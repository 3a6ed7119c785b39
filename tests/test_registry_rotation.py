"""The driver-registry rotation: the 50-slot correctness window must
auto-cover never-checked queries each round (kg_* canaries pinned first)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod


def _fake_reg(names):
    return {n: (lambda sf_dir: None) for n in names}


def test_canaries_pinned_and_unchecked_fronted():
    names = (
        entrymod._CANARIES
        + ["q_green_1", "q_new_1", "q_green_2", "q_new_2", "q_failed"]
    )
    reg = _fake_reg(names)
    out = entrymod._rotate_for_coverage(
        reg, green={"q_green_1", "q_green_2", "kg_mentions"}
    )
    keys = list(out)
    # canaries always occupy slots 1-5 even when already green
    assert keys[:5] == entrymod._CANARIES
    # never-green (new or previously failed) queries come next, original order
    assert keys[5:8] == ["q_new_1", "q_new_2", "q_failed"]
    # previously-green queries go to the back, original order
    assert keys[8:] == ["q_green_1", "q_green_2"]
    # a rotation never gains or loses entries
    assert set(out) == set(reg) and all(out[k] is reg[k] for k in reg)


def test_rotation_from_committed_correctness_files():
    """Against the real repo files: every name green in CORRECTNESS_r01/r02
    must sit behind every never-checked name (canaries excepted)."""
    import glob
    import json

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    green = set()
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            for name, row in json.load(f).items():
                if (
                    isinstance(row, dict)
                    and row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("err") is None
                ):
                    green.add(name)
    reg = entrymod.queries()
    keys = list(reg)
    assert keys[:5] == entrymod._CANARIES
    tail = keys[5:]
    seen_green = False
    for k in tail:
        if k in green:
            seen_green = True
        else:
            assert not seen_green, f"unchecked {k} ordered after a green query"


def test_window_covers_new_queries_each_round():
    """Simulating rounds: repeatedly marking the window green must cover the
    whole registry within ceil((N-5)/45)+... rounds (every query eventually
    gets a driver row)."""
    reg = entrymod.queries()
    green: set[str] = set()
    rounds = 0
    while len(green) < len(reg) and rounds < 10:
        ordered = list(entrymod._rotate_for_coverage(reg, green=green))
        green.update(ordered[:50])
        rounds += 1
    assert len(green) == len(reg)
    assert rounds <= (len(reg) - 5 + 44) // 45 + 1


def test_no_oracle_entries_never_front_fill(monkeypatch):
    """Rows-only entries (no oracle_sql) must not consume front-of-window
    slots they can never convert to a hash-green row (round-3 VERDICT)."""
    names = entrymod._CANARIES + ["q_new", "q_rows_only", "q_green"]
    reg = _fake_reg(names)
    monkeypatch.setattr(entrymod, "_NO_ORACLE", {"q_rows_only"})
    out = list(entrymod._rotate_for_coverage(reg, green={"q_green"}))
    # never-green hash-checkable first, then green, then no-oracle last
    assert out == entrymod._CANARIES + ["q_new", "q_green", "q_rows_only"]
    # a no-oracle entry that somehow went green is ordered as green
    # (registry order among green entries: q_rows_only precedes q_green)
    out2 = list(
        entrymod._rotate_for_coverage(reg, green={"q_green", "q_rows_only"})
    )
    assert out2 == entrymod._CANARIES + ["q_new", "q_rows_only", "q_green"]
