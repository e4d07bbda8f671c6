"""Unit tests for the driver-verification rotation in __spark_entry__:
the window only covers ~50 entries per round, so mis-ranking silently
starves entries of driver evidence (this exact bug cost rounds 2-3 the
hash rows for four upgraded-oracle entries)."""

from __future__ import annotations

import json

import __spark_entry__ as entrymod
from amazon_macie_activity_generator_spark.queries import QUERIES


def _write(tmp_path, fname, artifact):
    (tmp_path / fname).write_text(json.dumps(artifact))


def _with_here(tmp_path, monkeypatch):
    monkeypatch.setattr(entrymod, "_HERE", str(tmp_path))


PASS_ROW = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
FAIL_ROW = {"rows_match": True, "schema_match": True, "hash_match": False, "err": None}
NO_ORACLE_ROW = {"rows_match": None, "schema_match": None, "hash_match": None,
                 "err": "no_oracle"}


def test_rounds_sort_numerically_not_lexicographically(tmp_path, monkeypatch):
    names = list(QUERIES)
    a, b = names[0], names[1]
    # r2 says `a` failed; r10 says `a` passed. Lexicographic order would
    # treat r2 as latest and rank `a` at 0 (failed).
    _write(tmp_path, "CORRECTNESS_r2.json", {a: FAIL_ROW, b: PASS_ROW})
    _write(tmp_path, "CORRECTNESS_r10.json", {a: PASS_ROW, b: PASS_ROW})
    _with_here(tmp_path, monkeypatch)
    order = entrymod._rotation_order()
    # both checked-in-latest-and-passed: they rank 3, behind every
    # never-checked entry
    assert order.index(a) > len(names) - 10
    assert order.index(b) > len(names) - 10


def test_failed_entry_ranks_first(tmp_path, monkeypatch):
    names = [n for n in QUERIES if QUERIES[n][1] is not None]
    failed, passed = names[-1], names[0]
    artifact = {n: PASS_ROW for n in QUERIES}
    artifact[failed] = FAIL_ROW
    _write(tmp_path, "CORRECTNESS_r1.json", artifact)
    _with_here(tmp_path, monkeypatch)
    order = entrymod._rotation_order()
    assert order[0] == failed
    assert order.index(passed) > 0


def test_no_oracle_row_with_oracle_now_is_promoted(tmp_path, monkeypatch):
    oracle_backed = [n for n in QUERIES if QUERIES[n][1] is not None]
    upgraded = oracle_backed[5]
    artifact = {n: PASS_ROW for n in QUERIES}
    artifact[upgraded] = NO_ORACLE_ROW  # checked rows-only, oracle exists NOW
    _write(tmp_path, "CORRECTNESS_r1.json", artifact)
    _with_here(tmp_path, monkeypatch)
    order = entrymod._rotation_order()
    # rank 1 (never hash-verified) puts it ahead of every rank-3 pass
    assert order.index(upgraded) == 0


def test_stale_evidence_outranks_fresh_pass(tmp_path, monkeypatch):
    oracle_backed = [n for n in QUERIES if QUERIES[n][1] is not None]
    stale, fresh = oracle_backed[3], oracle_backed[4]
    _write(tmp_path, "CORRECTNESS_r1.json", {stale: PASS_ROW})
    _write(tmp_path, "CORRECTNESS_r2.json", {fresh: PASS_ROW})
    _with_here(tmp_path, monkeypatch)
    order = entrymod._rotation_order()
    assert order.index(stale) < order.index(fresh)


def test_duplicate_round_numbers_do_not_crash(tmp_path, monkeypatch):
    # r3 and r03 parse to the same round: sorting must key on the number,
    # not fall through to comparing the artifact dicts (TypeError).
    names = list(QUERIES)
    _write(tmp_path, "CORRECTNESS_r3.json", {names[0]: PASS_ROW})
    _write(tmp_path, "CORRECTNESS_r03.json", {names[1]: PASS_ROW})
    _with_here(tmp_path, monkeypatch)
    order = entrymod._rotation_order()
    assert set(order) == set(QUERIES)


def test_oldest_stale_evidence_refreshed_first(tmp_path, monkeypatch):
    # Three stale entries with evidence from r1/r2/r3 and a newest round
    # r4: within rank 2 the r1-era row must come first, regardless of
    # catalog insertion order.
    oracle_backed = [n for n in QUERIES if QUERIES[n][1] is not None]
    e1, e2, e3, fresh = oracle_backed[6], oracle_backed[2], oracle_backed[9], oracle_backed[0]
    _write(tmp_path, "CORRECTNESS_r1.json", {e3: PASS_ROW})
    _write(tmp_path, "CORRECTNESS_r2.json", {e2: PASS_ROW})
    _write(tmp_path, "CORRECTNESS_r3.json", {e1: PASS_ROW})
    _write(tmp_path, "CORRECTNESS_r4.json", {fresh: PASS_ROW})
    _with_here(tmp_path, monkeypatch)
    order = entrymod._rotation_order()
    assert order.index(e3) < order.index(e2) < order.index(e1)
    assert order.index(fresh) > order.index(e1)


def test_no_artifacts_preserves_catalog_order_oracle_first(tmp_path, monkeypatch):
    _with_here(tmp_path, monkeypatch)
    order = entrymod._rotation_order()
    assert set(order) == set(QUERIES)
    # oracle-backed entries come before rows-only ones within the rank
    first_rows_only = next(i for i, n in enumerate(order) if QUERIES[n][1] is None)
    assert all(QUERIES[n][1] is not None for n in order[:first_rows_only])
