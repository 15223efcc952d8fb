"""The driver records a capped number of CORRECTNESS rows per round, so
__spark_entry__.queries() must order entries mechanically by staleness:
never-recorded (or red-recorded) first, then oldest-round-first, ties in
catalog order. Pure-python contract tests — no Spark session."""

from __future__ import annotations

import glob
import json
import os
import re

import __spark_entry__ as entry_mod


def _expected_history() -> dict[str, int]:
    # independent re-derivation of the staleness map from the repo's real
    # CORRECTNESS_r*.json files (red rows — err other than the by-design
    # no_oracle marker — do not count as recorded)
    here = os.path.dirname(os.path.abspath(entry_mod.__file__))
    hist: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as f:
            blob = json.load(f)
        for name, row in blob.items():
            if isinstance(row, dict) and row.get("err") not in (None, "no_oracle"):
                continue
            hist[name] = max(hist.get(name, -1), rnd)
    return hist


def test_queries_sorted_stalest_first():
    hist = _expected_history()
    names = list(entry_mod.queries())
    ranks = [hist.get(n, -1) for n in names]
    assert ranks == sorted(ranks), (
        "queries() must be ordered by last-verified round ascending; got "
        + ", ".join(f"{n}:{r}" for n, r in zip(names, ranks)))


def test_red_rows_sort_as_never_recorded():
    # a red row in the newest file must not count as verified: such an
    # entry has to appear before every entry with a usable row that round
    hist = _expected_history()
    files = glob.glob(os.path.join(
        os.path.dirname(os.path.abspath(entry_mod.__file__)),
        "CORRECTNESS_r*.json"))
    newest = max(files, key=lambda p: int(re.search(r"_r(\d+)\.json$", p).group(1)))
    newest_rnd = int(re.search(r"_r(\d+)\.json$", newest).group(1))
    with open(newest) as f:
        blob = json.load(f)
    red = [n for n, row in blob.items()
           if isinstance(row, dict) and row.get("err") not in (None, "no_oracle")]
    names = list(entry_mod.queries())
    for n in red:
        if n in names:
            assert hist.get(n, -1) < newest_rnd


def test_every_oracle_has_a_query():
    q = entry_mod.queries()
    for name in entry_mod.oracle_sql():
        assert name in q, f"oracle_sql() entry {name} missing from queries()"
