"""Keep documented benchmark claims in sync with the committed evidence.

Recomputes the pdbs_test median ROC AUCs from the committed CSV artifacts
and asserts the numbers stated in README.md / docs/VALIDATION.md match to
4 decimals, so the claims cannot drift from the evidence (VERDICT round-1
weak item 4)."""

import csv
import pathlib
import re

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]


def _median(csv_path, col):
    rows = list(csv.DictReader(open(csv_path)))
    vals = [float(r[col]) for r in rows if r.get(col)]
    assert len(vals) >= 50, f"{csv_path} unexpectedly small ({len(vals)} rows)"
    return float(np.median(vals))


@pytest.fixture(scope="module")
def medians():
    full = REPO / "ppi_benchmark_full.csv"
    fast = REPO / "ppi_benchmark_fastmode.csv"
    if not full.exists() or not fast.exists():
        pytest.skip("benchmark CSV artifacts not committed")
    return {
        "full_ours": _median(full, "auc_ours"),
        "full_ref": _median(full, "auc_reference"),
        "fast_ours": _median(fast, "auc_ours"),
    }


def test_readme_medians_match_csv(medians):
    text = (REPO / "README.md").read_text()
    stated = re.search(r"median ROC AUC\s+(0\.\d{4}) with i_v4_0 weights vs (0\.\d{4})", text)
    assert stated, "README.md no longer states the pdbs_test medians"
    assert abs(float(stated.group(1)) - medians["full_ours"]) < 5e-5
    assert abs(float(stated.group(2)) - medians["full_ref"]) < 5e-5


def test_validation_medians_match_csv(medians):
    text = (REPO / "docs" / "VALIDATION.md").read_text()
    stated = re.search(r"median ROC AUC (0\.\d{4})\*\* vs \*\*(0\.\d{4})", text)
    assert stated, "VALIDATION.md no longer states the pdbs_test medians"
    assert abs(float(stated.group(1)) - medians["full_ours"]) < 5e-5
    assert abs(float(stated.group(2)) - medians["full_ref"]) < 5e-5

    fast = re.search(r"bf16 \+ fast kNN\): median AUC (0\.\d{4}) vs (0\.\d{4})", text)
    assert fast, "VALIDATION.md no longer states the fast-mode median"
    assert abs(float(fast.group(1)) - medians["fast_ours"]) < 5e-5
    assert abs(float(fast.group(2)) - medians["full_ours"]) < 5e-5


def test_performance_doc_medians_match_csv(medians):
    text = (REPO / "docs" / "PERFORMANCE.md").read_text()
    stated = re.search(r"pdbs_test median AUC (0\.\d{4}) vs (0\.\d{4}) exact", text)
    assert stated, "PERFORMANCE.md no longer states the fast-mode medians"
    assert abs(float(stated.group(1)) - medians["fast_ours"]) < 5e-5
    assert abs(float(stated.group(2)) - medians["full_ours"]) < 5e-5


def test_bench_docstring_medians_match_csv(medians):
    """bench.py's quoted serving-accuracy numbers must track the committed
    benchmark CSVs (round-2 carried stale values)."""
    text = open(REPO / "bench.py").read()
    stated = re.search(
        r"median AUC (0\.\d{4}) with exact\s*\nkNN, (0\.\d{4}) in fast-kNN mode", text
    )
    assert stated, "bench.py no longer states the pdbs_test medians"
    assert abs(float(stated.group(1)) - medians["full_ours"]) < 5e-5
    assert abs(float(stated.group(2)) - medians["fast_ours"]) < 5e-5


def test_serving_load_table_matches_artifact():
    """PERFORMANCE.md's concurrent-load table must track the committed
    sweep artifact (docs/artifacts/serving_load.json) — the same
    anti-drift contract as the AUC medians (VERDICT round-3 item 6)."""
    import json

    art = REPO / "docs" / "artifacts" / "serving_load.json"
    if not art.exists():
        pytest.skip("serving_load.json not committed")
    rows = {(r["knn_method"], r["clients"]): r
            for r in json.load(open(art))["rows"]}
    text = (REPO / "docs" / "PERFORMANCE.md").read_text()
    table = re.findall(
        r"\|\s*(exact|fast)\s*\|\s*(\d+)\s*\|\s*\**([\d.]+)\**\s*\|"
        r"\s*(\d+)\s*ms\s*\|\s*(\d+)\s*ms\s*\|\s*([\d.]+)\s*\|",
        text,
    )
    assert len(table) >= 5, "PERFORMANCE.md lost the concurrent-load table"
    for method, clients, rps, p50, p99, mb in table:
        r = rows[(method, int(clients))]
        assert abs(float(rps) - r["requests_per_sec"]) < 0.05 + r["requests_per_sec"] * 0.005
        assert abs(float(p50) - r["p50_ms"]) < 1.0
        assert abs(float(p99) - r["p99_ms"]) < 1.0
        assert abs(float(mb) - r["mean_batch_size"]) < 0.05


def _latest_bench():
    """Most recent committed bench evidence: the driver's end-of-round
    BENCH_r{N}.json files, plus any committed mid-round on-chip run log
    (docs/artifacts/bench_round{N}_onchip.log), which sits between round
    N-1's and round N's BENCH files in time."""
    import json

    candidates = []  # (recency_rank, parsed)
    for p in REPO.glob("BENCH_r*.json"):
        rnd = int(re.search(r"BENCH_r0*(\d+)", p.name).group(1))
        data = json.load(open(p))
        parsed = data.get("parsed") or {}
        if not parsed.get("detail"):
            # some rounds store the JSON line only in "tail"
            for line in reversed(data.get("tail", "").splitlines()):
                if line.startswith("{"):
                    parsed = json.loads(line)
                    break
        if parsed.get("detail"):
            candidates.append((2 * rnd, parsed))
    for p in (REPO / "docs" / "artifacts").glob("bench_round*_onchip.log"):
        rnd = int(re.search(r"bench_round0*(\d+)", p.name).group(1))
        parsed = None
        for line in reversed(p.read_text().splitlines()):
            if line.startswith("{"):
                try:
                    parsed = json.loads(line)
                except json.JSONDecodeError:
                    parsed = None
                break
        if parsed and parsed.get("detail"):
            candidates.append((2 * rnd - 1, parsed))
    if not candidates:
        pytest.skip("no bench evidence committed")
    return max(candidates, key=lambda c: c[0])[1]


def test_readme_train_claims_match_bench():
    """README's training throughput claims must track the latest BENCH
    JSON (VERDICT round-4 weak 2: README said ~6x where the like-for-like
    sustained number was ~1.6x). Relative tolerance covers run-to-run
    noise; a wrong-number swap (4x off) still fails."""
    parsed = _latest_bench()
    det = parsed["detail"]
    text = (REPO / "README.md").read_text()

    m = re.search(r"\*\*~([\d.]+) structures/s\*\* sustained mixed", text)
    assert m, "README.md no longer states the sustained mixed train rate"
    mixed = det.get("train_mixed") or {}
    if mixed.get("structures_per_sec"):
        assert abs(float(m.group(1)) - mixed["structures_per_sec"]) \
            <= 0.30 * mixed["structures_per_sec"]

    m = re.search(r"1k-atom bucket alone runs ~([\d.]+)/s", text)
    assert m, "README.md no longer states the 1k-bucket train rate"
    sps_1k = det.get("train_1k_structures_per_sec") or det.get(
        "train_structures_per_sec")
    if sps_1k:
        assert abs(float(m.group(1)) - sps_1k) <= 0.30 * sps_1k

    m = re.search(r"~([\d.]+)× the reference's\s+~5/s", text)
    assert m, "README.md no longer states the vs-V100 multiple"
    if mixed.get("structures_per_sec"):
        want = mixed["structures_per_sec"] / 5.0
        assert abs(float(m.group(1)) - want) <= 0.30 * want


def test_readme_headline_matches_bench():
    """README's headline e2e number and multiple must divide parse-
    inclusive by parse-inclusive (VERDICT round-4 weak 3)."""
    parsed = _latest_bench()
    det = parsed["detail"]
    text = (REPO / "README.md").read_text()

    m = re.search(r"\*\*~([\d,]+) atoms/s\*\* end-to-end from PDB files", text)
    assert m, "README.md no longer states the parse-inclusive headline"
    e2e_pdb = det.get("e2e_from_pdb_atoms_per_sec")
    if e2e_pdb:
        stated = float(m.group(1).replace(",", ""))
        assert abs(stated - e2e_pdb) <= 0.30 * e2e_pdb

    m = re.search(r"~([\d,]+)× the reference PyTorch implementation parsing", text)
    assert m, "README.md no longer states the like-for-like multiple"
    if e2e_pdb:
        stated = float(m.group(1).replace(",", ""))
        want = e2e_pdb / 36.6
        assert abs(stated - want) <= 0.30 * want


def test_coverage_doc_train_mixed_matches_bench():
    """docs/COVERAGE.md's sustained-mixed figure must track BENCH
    (VERDICT round-4 weak 2: COVERAGE said 9.2 where BENCH said 7.81)."""
    parsed = _latest_bench()
    mixed = (parsed["detail"].get("train_mixed") or {})
    if not mixed.get("structures_per_sec"):
        pytest.skip("latest BENCH has no train_mixed")
    text = (REPO / "docs" / "COVERAGE.md").read_text()
    m = re.search(r"sustained mixed ([\d.]+)/s", text)
    assert m, "COVERAGE.md no longer states the sustained mixed rate"
    assert abs(float(m.group(1)) - mixed["structures_per_sec"]) \
        <= 0.30 * mixed["structures_per_sec"]
