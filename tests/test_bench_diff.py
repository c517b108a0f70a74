"""bench_diff.py: the calibrated comparison logic itself (box-factor
median, flag thresholding, driver-tail scraping)."""

import json
import subprocess
import sys


def _run(tmp_path, old, new, *extra):
    a, b = tmp_path / "old.json", tmp_path / "new.json"
    a.write_text(json.dumps(old))
    b.write_text(json.dumps(new))
    p = subprocess.run(
        [sys.executable, "bench_diff.py", str(a), str(b), *extra],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert p.returncode == 0, p.stdout + p.stderr
    return json.loads(p.stdout.strip().splitlines()[-1])


def test_uniform_slowdown_is_the_box_not_the_code(tmp_path):
    old = {"queries": {f"q{i}": 1.0 for i in range(10)}}
    new = {"queries": {f"q{i}": 1.8 for i in range(10)}}
    out = _run(tmp_path, old, new)
    assert out["box_factor"] == 1.8
    assert out["flagged"] == []  # everything moved WITH the box


def test_single_real_regression_is_flagged(tmp_path):
    old = {"queries": {f"q{i}": 1.0 for i in range(10)}}
    qs = {f"q{i}": 1.2 for i in range(10)}
    qs["q3"] = 4.0  # 3.3x the calibrated factor
    out = _run(tmp_path, old, {"queries": qs})
    assert [f["query"] for f in out["flagged"]] == ["q3"]
    assert out["flagged"][0]["adj_ratio"] > 3


def test_flag_ratio_option_both_spellings(tmp_path):
    old = {"queries": {f"q{i}": 1.0 for i in range(10)}}
    qs = {f"q{i}": 1.0 for i in range(10)}
    qs["q5"] = 1.5  # 1.5x: under default 1.6, over 1.4
    for extra in (["--flag-ratio", "1.4"], ["--flag-ratio=1.4"]):
        out = _run(tmp_path, old, {"queries": qs}, *extra)
        assert [f["query"] for f in out["flagged"]] == ["q5"], extra
    assert _run(tmp_path, old, {"queries": qs})["flagged"] == []


def test_driver_tail_scrape_keeps_all_complete_pairs(tmp_path):
    # a driver-style file: parsed null, tail cut mid-pair at the FRONT
    tail = 'act": 0.906, "alpha": 1.5, "beta": 2.25}'
    old = {"parsed": None, "tail": tail}
    new = {"queries": {"alpha": 1.5, "beta": 2.25, "gamma": 9.9}}
    out = _run(tmp_path, old, new)
    # 'act' (cut pair, regex-invisible opening quote... but here the
    # quote IS present before 'act'? no: tail starts with act") -> only
    # alpha/beta are complete
    assert out["common"] == 2
    assert out["box_factor"] == 1.0


def test_small_absolute_deltas_not_flagged(tmp_path):
    # 2x ratio but 0.1s absolute: below the 0.3s materiality floor
    old = {"queries": {"a": 0.1, "b": 1.0, "c": 1.0, "d": 1.0}}
    new = {"queries": {"a": 0.2, "b": 1.0, "c": 1.0, "d": 1.0}}
    assert _run(tmp_path, old, new)["flagged"] == []


def test_bench_common_subset_is_a_standing_artifact(monkeypatch, tmp_path):
    """VERDICT r7 item 7: bench.py itself reports the common-subset
    subtotal + box factor against the PREVIOUS round's full artifact
    (not any same-round re-run), so the calibrated round-over-round
    number is produced every round, not as a one-off analysis."""
    import bench

    prev = {
        "queries": {"a": 1.0, "b": 2.0, "c": 4.0, "gone": 9.0},
    }
    with open(tmp_path / "BENCH_full_r07.json", "w") as fh:
        json.dump(prev, fh)
    # a same-round artifact must be ignored (it would be self-compare)
    with open(tmp_path / "BENCH_full_r08.json", "w") as fh:
        json.dump({"queries": {"a": 99.0}}, fh)
    monkeypatch.setattr(
        bench.os.path, "dirname", lambda _p: str(tmp_path)
    )
    # box slows uniformly 2x; one new gate appears, one old gate gone
    timings = {"a": 2.0, "b": 4.0, "c": 8.0, "new": 5.0}
    d = bench._common_subset_diff(timings, this_round=8)
    assert d["prev"] == "BENCH_full_r07.json"
    assert d["common"] == 3
    assert abs(d["box_factor"] - 2.0) < 1e-9
    assert d["prev_subtotal"] == 7.0 and d["subtotal"] == 14.0
    assert abs(d["calibrated_subtotal"] - 7.0) < 1e-9
    # no prior round -> no section, not a crash
    assert bench._common_subset_diff(timings, this_round=7) is None
