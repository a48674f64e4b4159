"""Driver-gate orchestrator robustness (bench.py).

The gate's contract with the driver: every printed line is a complete
JSON superset of the previous one, and a leg that hits its cap must
not cost fields already measured. Round 5 hardened this twice — leg
subprocesses print incrementally as results land, and the parent
salvages a timed-out leg's partial stdout — after a flaky relay
window cost two rehearsals their entire headline.
"""

from __future__ import annotations

import importlib.util
import sys
import textwrap
from pathlib import Path

REPO = Path(__file__).parent.parent


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_gate_under_test", REPO / "bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestLegSalvage:
    def test_timeout_salvages_partial_json(self, tmp_path):
        """A leg killed at its cap after printing an incremental line
        must still contribute that line."""
        bench = _load_bench()
        leg = tmp_path / "slow_leg.py"
        leg.write_text(textwrap.dedent("""
            import json, sys, time
            print(json.dumps({"funnel_ms_per_query": 3.1}), flush=True)
            print(json.dumps(
                {"funnel_ms_per_query": 3.1, "extra": 1}), flush=True)
            time.sleep(60)  # the cap kills us mid-extra-measurement
            print(json.dumps({"never": 1}))
        """))
        out = bench._run_leg([sys.executable, "-u", str(leg)], 8.0, "t")
        assert out == {"funnel_ms_per_query": 3.1, "extra": 1}

    def test_timeout_with_no_output_returns_none(self, tmp_path):
        bench = _load_bench()
        leg = tmp_path / "silent_leg.py"
        leg.write_text("import time; time.sleep(60)")
        out = bench._run_leg([sys.executable, str(leg)], 6.0, "t")
        assert out is None

    def test_last_json_line_wins(self, tmp_path):
        bench = _load_bench()
        leg = tmp_path / "ok_leg.py"
        leg.write_text(textwrap.dedent("""
            import json
            print(json.dumps({"a": 1}))
            print("# commentary")
            print(json.dumps({"a": 2, "b": 3}))
        """))
        out = bench._run_leg([sys.executable, str(leg)], 30.0, "t")
        assert out == {"a": 2, "b": 3}

    def test_crash_still_parses_prior_lines(self, tmp_path):
        bench = _load_bench()
        leg = tmp_path / "crash_leg.py"
        leg.write_text(textwrap.dedent("""
            import json
            print(json.dumps({"a": 1}), flush=True)
            raise SystemExit(3)
        """))
        out = bench._run_leg([sys.executable, str(leg)], 30.0, "t")
        assert out == {"a": 1}
