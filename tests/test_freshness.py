"""Freshness-tier invariants (round-10, r9 verdict #4).

The registry holds ~5x more oracle entries than the driver's 50-slot
verdict window, so "every entry re-verdicted every N rounds" is
arithmetically impossible. The policy in queries.py partitions the
oracle-bearing registry into explicit tiers — WINDOW / CHANGED /
PENDING / FROZEN / fresh — and THIS file enforces the partition against
the actual CORRECTNESS_r*.json artifacts the driver wrote, so the
policy cannot silently drift from reality:

- no non-frozen oracle entry may carry a driver verdict older than
  3 rounds unless it is in the current window, changed this round
  (triple-SF-swept), or in the PENDING book with a <=3-round-old change;
- FROZEN entries must have been driver-green at least once and must not
  have changed recently (a changed entry cannot hide in the freezer);
- the PENDING book must drain: a pending entry's change round may never
  fall more than 3 rounds behind CURRENT_ROUND.
"""

from __future__ import annotations

import glob
import json
import os
import re

from parquet_export_spark.queries import (
    CURRENT_ROUND,
    FROZEN,
    PENDING_VERDICT,
    REGISTRY,
    WINDOW_ROWS_ONLY,
    _VERDICT_PRIORITY,
)
from tests.test_oracle_sweep import PREV_ROUND_CHANGED, ROUND_CHANGED

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _last_verdicts() -> dict[str, int]:
    last: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for name in json.load(open(f)):
            last[name] = max(last.get(name, 0), rnd)
    return last


def test_current_round_tracks_artifacts():
    """CURRENT_ROUND must track the newest CORRECTNESS artifact — a
    stale bump voids every deadline below. Two states are legal
    (r10 advice — the driver drops the round-N artifact BEFORE the
    round-N+1 rotation commits, so requiring exactly max+1 turned the
    suite red in the gap): max+1 (normal, post-rotation) or max (the
    current round's artifact just landed, rotation pending)."""
    rounds = [
        int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for f in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))
    ]
    assert rounds, "driver artifacts missing"
    assert CURRENT_ROUND in (max(rounds), max(rounds) + 1)


def test_sweep_lists_carry_no_duplicates():
    """r10 verdict #3: duplicate names in ROUND_CHANGED /
    PREV_ROUND_CHANGED re-run sweep legs for nothing and corrupt the
    bookkeeping counts — enforced here, not re-advised."""
    for lst in (ROUND_CHANGED, PREV_ROUND_CHANGED, _VERDICT_PRIORITY):
        dupes = [n for n in set(lst) if lst.count(n) > 1]
        assert not dupes, sorted(dupes)


def test_window_is_fifty_oracle_bearing_and_first():
    """Every slot is oracle-bearing EXCEPT the declared
    WINDOW_ROWS_ONLY exceptions (r12: bpe_learn_merges takes its first
    driver contact as a rows-only check, r11 verdict #2) — the
    exception set must be explicit, in the window, and genuinely
    rows-only, so a slot can never silently downgrade."""
    assert len(_VERDICT_PRIORITY) == 50
    assert len(set(_VERDICT_PRIORITY)) == 50
    for name in _VERDICT_PRIORITY:
        assert REGISTRY[name].oracle or name in WINDOW_ROWS_ONLY, (
            f"{name} holds a slot but is rows-only and undeclared"
        )
    for name in WINDOW_ROWS_ONLY:
        assert name in _VERDICT_PRIORITY, f"{name} declared but unslotted"
        assert not REGISTRY[name].oracle, (
            f"{name} declared rows-only but carries an oracle"
        )
    # the reorder actually happened: window names lead the registry
    assert list(REGISTRY)[:50] == _VERDICT_PRIORITY


def test_window_front_loads_never_verdicted_entries():
    """Standing rule 1: every oracle entry with NO driver verdict at
    all must hold a slot in the current window — except entries whose
    oracle was BORN this round (ROUND_CHANGED): a window fixed at
    rotation time cannot hold entries registered after it, so those
    ride the triple-SF sweep now and take window priority next round
    (exactly how the 27 r9-born entries reached the r10 window)."""
    last = _last_verdicts()
    never = {
        n for n, s in REGISTRY.items() if s.oracle and n not in last
    }
    unexplained = never - set(_VERDICT_PRIORITY) - set(ROUND_CHANGED)
    assert not unexplained, sorted(unexplained)


def test_frozen_entries_are_eligible():
    last = _last_verdicts()
    for name in FROZEN:
        assert name in REGISTRY and REGISTRY[name].oracle, name
        assert name in last, f"{name} frozen without any driver verdict"
        assert name not in ROUND_CHANGED, f"{name} changed this round"
        assert name not in PREV_ROUND_CHANGED, f"{name} changed last round"
        assert name not in PENDING_VERDICT, f"{name} double-booked"


def test_pending_book_drains():
    for name, changed_round in PENDING_VERDICT.items():
        assert name in REGISTRY and REGISTRY[name].oracle, name
        assert CURRENT_ROUND - changed_round <= 3, (
            f"{name} changed in r{changed_round} and still has no "
            f"post-change driver verdict at r{CURRENT_ROUND} — it must "
            f"take a window slot"
        )


def test_no_unexplained_stale_oracle_entry():
    """The core invariant: every oracle-bearing entry is either in the
    current window, changed this round (triple-SF-swept), pending with
    a fresh change, frozen, or driver-verdicted within 3 rounds."""
    last = _last_verdicts()
    window = set(_VERDICT_PRIORITY)
    stale = []
    for name, spec in REGISTRY.items():
        if not spec.oracle:
            continue
        if name in window or name in ROUND_CHANGED:
            continue
        if name in PENDING_VERDICT or name in FROZEN:
            continue  # their own tests bound these tiers
        if last.get(name, -(10**9)) < CURRENT_ROUND - 3:
            stale.append((name, last.get(name)))
    assert not stale, (
        f"oracle entries outside every tier with verdicts older than "
        f"3 rounds: {sorted(stale)}"
    )
