"""The driver records only the final 2000 bytes of bench stdout and
parses the last line as the round's artifact — BENCH_r02..r04 landed
`"parsed": null` because the verbose payload overran that window. This
gate pins the fix: the emitted line must stay parseable and inside the
window even at worst-case timing widths, for the full current headline
set, with no Spark session involved."""

from __future__ import annotations

import importlib.util
import json
import sys


def _load_bench(tmp_path):
    spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # redirect the BENCH_DETAIL_LAST.json side-write away from the repo
    mod.__dict__["__file__"] = str(tmp_path / "bench.py")
    return mod


def test_emit_line_fits_driver_window_at_worst_case_widths(tmp_path, capsys):
    bench = _load_bench(tmp_path)
    # every headline key plus the synthetic-corpus extras the real run
    # appends, all at the widest realistic rendering (xxx.xxx)
    timings = {k: 999.999 for k in bench.HEADLINE}
    timings["context_window_100"] = 999.999
    timings["transcript_extraction"] = 999.999
    timings["turns_per_sec"] = 999999.9
    timings["kg_pipeline"] = 999.999
    bench._emit(timings, dict(timings), n_turns=99_999_999)
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert len(line) <= 1900, f"artifact line {len(line)}B overruns the tail window"
    payload = json.loads(line)
    assert payload["metric"] == "headline_queries_total"
    assert set(timings) == set(payload["queries"])
    # the detail record went to tmp, not the committed artifact
    assert (tmp_path / "BENCH_DETAIL_LAST.json").exists()


def test_emit_shrinks_rather_than_truncates(tmp_path, capsys):
    """With an absurdly wide timings dict the fallback must shrink
    precision (still valid JSON), never emit a >1900B line."""
    bench = _load_bench(tmp_path)
    timings = {f"very_long_synthetic_query_name_{i:03d}": 123.456789 for i in range(70)}
    timings["turns_per_sec"] = 123456.789
    bench._emit(timings, dict(timings), n_turns=1)
    line = capsys.readouterr().out.strip().splitlines()[-1]
    payload = json.loads(line)
    assert len(line) <= 1900
    # either the full per-query map fit, or the line degraded to the
    # headline summary with an explicit pointer at the detail record
    assert len(payload["queries"]) == len(timings) or (
        payload.get("detail") == "BENCH_DETAIL_LAST.json"
        and payload["value"] > 0
    )


def test_plan_census_allowlist_keys_exist():
    """Every key in the census cartesian allowlist must still be a
    contract query — a rename would otherwise silently un-adjudicate a
    by-design cartesian and the census would start failing as
    'unexpected'."""
    spec = importlib.util.spec_from_file_location(
        "plan_census", "/root/repo/tools/plan_census.py"
    )
    census = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(census)
    spec2 = importlib.util.spec_from_file_location("se", "/root/repo/__spark_entry__.py")
    entry = importlib.util.module_from_spec(spec2)
    spec2.loader.exec_module(entry)
    missing = set(census.CARTESIAN_BY_DESIGN) - set(entry.queries())
    assert not missing, f"allowlisted keys no longer in queries(): {missing}"
