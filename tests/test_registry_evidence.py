"""Machine-check of the rotation invariant the r7 VERDICT found broken:
every oracle-backed registry entry must either already have a green driver
row in some committed CORRECTNESS_r*.json, or sit in the current
_DRIVER_PRIORITY head (the slots the driver will oracle THIS round).
``func_geo_srid`` was added late in round 7 and never slated — the only
entry that had zero hard evidence; this test makes that gap impossible to
reintroduce silently.

Rows-only names carry PYTEST-ONLY evidence: the driver records a head
entry without an oracle as a bare ``err: "no_oracle"`` marker with
``rows_match: null`` (observed r9), which _driver_green_names() will
never count green — so slating them buys a marker, not a check. Don't
spend slots on them again (r9 verdict); their correctness lives in the
unit/property lanes, and where a stub dataflow is deterministic enough
to oracle, promote it instead (r10 did exactly that for
multimodal_features / multimodal_resize)."""

from __future__ import annotations

import glob
import json
import os

from drill_calcite_spark.queries import (
    _DRIVER_PRIORITY, _NEXT_ROUND_HEAD, _ROWS_ONLY_FIRST_EVIDENCE,
    all_oracles,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The driver oracles the first N registry entries.
DRIVER_SLOTS = 50


def _driver_green_names() -> set[str]:
    green = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        for name, rec in json.load(open(path)).items():
            ok = rec.get("hash_match")
            if ok is None:  # rows-only entries: rows + no error
                ok = bool(rec.get("rows_match")) and not rec.get("err")
            if ok:
                green.add(name)
    return green


def test_every_oracle_backed_name_has_or_will_get_driver_evidence():
    oracle_names = set(all_oracles())
    covered = (_driver_green_names() | set(_DRIVER_PRIORITY[:DRIVER_SLOTS])
               | set(_NEXT_ROUND_HEAD))
    missing = sorted(oracle_names - covered)
    assert not missing, (
        f"oracle-backed queries with NO driver CORRECTNESS row and NO slot "
        f"in the current rotation (add them to _DRIVER_PRIORITY): {missing}")


def test_next_round_head_is_a_small_disjoint_queue():
    """The overflow queue may only hold names with NO committed row (they
    are exactly the ones that MUST lead the next slate), must not overlap
    the current head, and must stay small — it is a queue, not a dumping
    ground."""
    assert len(_NEXT_ROUND_HEAD) <= 10, "queue too large — rotate honestly"
    assert not set(_NEXT_ROUND_HEAD) & set(_DRIVER_PRIORITY), \
        "queued name already slated"
    assert set(_NEXT_ROUND_HEAD) <= set(all_oracles()), \
        "queued name is not oracle-backed"


def test_driver_priority_within_slots_and_unique():
    assert len(_DRIVER_PRIORITY) == len(set(_DRIVER_PRIORITY)), "duplicates"
    assert len(_DRIVER_PRIORITY) <= DRIVER_SLOTS, (
        f"{len(_DRIVER_PRIORITY)} prioritized names but the driver only "
        f"oracles the first {DRIVER_SLOTS}")
    # every prioritized name must be oracle-backed, EXCEPT the explicit
    # rows-only first-evidence slate (r9: the driver records a rows-only
    # check for head entries without an oracle, and eight rows-only names
    # had zero driver rows of any kind — one round of slots buys each its
    # first hard-signal row; they rotate back out once green)
    oracle_names = set(all_oracles())
    allowed_rows_only = set(_ROWS_ONLY_FIRST_EVIDENCE)
    not_backed = [n for n in _DRIVER_PRIORITY
                  if n not in oracle_names and n not in allowed_rows_only]
    assert not not_backed, f"slated but not oracle-backed: {not_backed}"
