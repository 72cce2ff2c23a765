#!/usr/bin/env python3
"""Build BENCH_SLOPE_EMBED.json from a quiet slopemas Bench run.

Usage: make_slope_embed.py <slopemas_log_or_json> <source_label>

Reads the final JSON line of a `SPARK_GRAFT_BENCH_ONLY=slopemas`
run (load-gated, cooldown-stamped), extracts the adjudicated
scale_slope table, the mas_* headline mins, the slope_stamp
convention and the load_gate, and writes BENCH_SLOPE_EMBED.json in
the repo root. A subsequent full-sweep Bench run embeds that file:
its committed BENCH JSON then carries the adjudicated evidence (with
source labels) instead of whatever the sweep host's load produced.
"""
import json
import subprocess
import sys


def main() -> None:
    path, label = sys.argv[1], sys.argv[2]
    last = None
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and '"metric"' in line:
                try:
                    last = json.loads(line)
                except json.JSONDecodeError:
                    pass
    if last is None:
        sys.exit("no parseable JSON line found in " + path)
    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
    except Exception:
        commit = None
    out = {
        "source": label,
        # provenance stamps (r15 advice): a full-sweep Bench run refuses
        # the embed when registry_size disagrees with its own build, and
        # publishes both commits so staleness is machine-checkable
        "registry_size": last.get("registry_size"),
        "commit": commit,
        "slope_stamp": last.get("slope_stamp"),
        "load_gate": last.get("load_gate"),
        "queries": last.get("queries"),
        "mas_firth_reps": last.get("mas_firth_reps"),
        "mas_firth20_reps": last.get("mas_firth20_reps"),
        "mas_linear_reps": last.get("mas_linear_reps"),
        "mas_firth_gram_reps": last.get("mas_firth_gram_reps"),
        "scale_slope": last.get("scale_slope"),
    }
    with open("BENCH_SLOPE_EMBED.json", "w", encoding="utf-8") as f:
        json.dump(out, f)
        f.write("\n")
    print(json.dumps(out, indent=1)[:2000])


if __name__ == "__main__":
    main()
