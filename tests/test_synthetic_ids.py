"""Source-level sweep for the synthetic-id collision class the 100x
decade smoke caught (round 8b): additive id offsets (doc_id + 1M
etc.) silently assume the input id range never reaches the offset —
false at scale.  Synthetic ids in any id-space that joins or groups
must be residue-class encoded (original = k*i, plant_j = k*i + j).

The sweep greps the non-test source for additive big-constant offsets
on id columns; every hit must be in the allowlist below with a
justification (a namespace that never joins against real ids)."""

from __future__ import annotations

import re
from pathlib import Path

SRC = Path(__file__).resolve().parent.parent / "stockpulse_spark"

#: additive offset of >= 6 digits applied to an id-class column.
#: Round 9 (advisor finding): quote-agnostic, keyed on the whole
#: *_id / *key column class rather than six hardcoded names, and
#: catches offsets routed through F.lit() — so renamed intermediates
#: (planted_id, __key) and single-quoted spellings can't slip the gate.
#: Round 10 (advisor): the bare `key` suffix is anchored to the known
#: id stems — `_key`/`_id` plus the TPC-H `*key` family (orderkey,
#: partkey, ... carry no underscore) — so an identifier merely ending
#: in the letters 'key' (`monkey + 1000000`) no longer false-positives
#: while `band_hash_key` and `l_orderkey` still trip the gate.
_PATTERN = re.compile(
    r"[A-Za-z_]\w*(?:_id|_key"
    r"|(?:order|part|supp|cust|nation|region|vec|event|doc|user)_?key)"
    r"['\"]?\s*\)*\s*\+\s*(?:F\.lit\(\s*)?[1-9][0-9]{5,}"
)

#: file -> why its additive offsets are collision-tolerant
ALLOWED = {
    # batch_id is a LABEL namespace: the incremental gate joins on
    # content hashes and band hashes, never on batch_id == doc_id,
    # so a collision cannot alias rows (verdicts key on batch_id
    # alone). The offset only keeps the label readable in tests.
    "plans/registry_funnel.py",
    # registry_corpus2.py was removed from this list in round 9: its
    # decontamination plants migrated to residue-class ids (k=4,
    # cohort offsets 0-3) for uniformity with the engine-wide scheme.
}


def _hits():
    out = []
    for p in SRC.rglob("*.py"):
        rel = str(p.relative_to(SRC))
        for i, line in enumerate(p.read_text().splitlines(), 1):
            code = line.split("#", 1)[0]
            if _PATTERN.search(code):
                out.append((rel, i, line.strip()))
    return out


def test_no_additive_id_offsets_outside_allowlist():
    bad = [(f, i, l) for f, i, l in _hits() if f not in ALLOWED]
    assert not bad, (
        "additive synthetic-id offsets found outside the allowlist — "
        "use residue-class ids (k*i + j) instead; collisions at scale "
        f"alias planted rows silently: {bad}"
    )


def test_allowlist_entries_still_exist():
    """An allowlist entry whose file no longer matches is stale —
    delete it so the gate stays tight."""
    files_with_hits = {f for f, _, _ in _hits()}
    stale = ALLOWED - files_with_hits
    assert not stale, f"stale allowlist entries: {stale}"


def test_sweep_fires_on_planted_violation():
    """Negative control: the regex must match the exact shape the
    100x smoke caught, in both Spark and SQL spellings."""
    assert _PATTERN.search('(F.col("doc_id") + 1000000).alias("doc_id")')
    assert _PATTERN.search("SELECT doc_id + 4000000 AS planted_id")
    # round-9 widenings: single quotes, renamed intermediates,
    # arbitrary *key columns, and offsets routed through F.lit()
    assert _PATTERN.search("(F.col('doc_id') + 1000000)")
    assert _PATTERN.search("planted_id + 3000000")
    assert _PATTERN.search('F.col("p_partkey") + 5000000')
    assert _PATTERN.search('F.col("vec_id") + F.lit(1000000)')
    # and must NOT match residue-class ids or small literals
    assert not _PATTERN.search('(F.col("doc_id") * 4 + 1).alias("doc_id")')
    assert not _PATTERN.search("SELECT doc_id + 1 AS next_id")
