#!/usr/bin/env python3
"""Build BENCH_SLOPE_EMBED.json from one or more quiet slopemas runs.

Usage: make_slope_embed.py <log_or_json>:<source_label> [more...]

Each argument is a path to a Bench log (or bare JSON line file) and a
short source label, colon-separated. The FIRST file is the base: its
headline mins (queries), rep arrays, stamp convention, load_gate and
registry_size are taken whole. Later files MERGE their scale_slope
families over the base (later wins per family) — the adjudication
path for expensive families measured in a dedicated min-of-2 run
(e.g. g02) without re-paying them in the base run. Per-family source
labels are recorded in slope_sources so a reader can trace every row
to its run.

A subsequent full-sweep Bench run embeds the file; it refuses it when
registry_size disagrees with its own build (r15 advice).
"""
import json
import subprocess
import sys


def read_last(path: str):
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
    return last


def main() -> None:
    specs = []
    for a in sys.argv[1:]:
        path, _, label = a.rpartition(":")
        if not path:
            sys.exit(f"argument '{a}' must be <path>:<label>")
        specs.append((path, label))
    if not specs:
        sys.exit(__doc__)
    base = read_last(specs[0][0])
    slope = dict(base.get("scale_slope") or {})
    sources = {k: specs[0][1] for k in slope if k != "docs"}
    registry = base.get("registry_size")
    for path, label in specs[1:]:
        d = read_last(path)
        extra = d.get("scale_slope") or {}
        if d.get("registry_size") != registry:
            print(f"note: {path} ran at registry_size={d.get('registry_size')} "
                  f"vs base {registry} (merged anyway; families below are "
                  "registry-independent measurements)")
        for k, v in extra.items():
            if k == "docs":
                continue
            slope[k] = v
            sources[k] = label
    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
    except Exception:
        commit = None
    out = {
        "source": "+".join(l for _, l in specs),
        "slope_sources": sources,
        # provenance stamps (r15 advice): a full-sweep Bench run refuses
        # the embed when registry_size disagrees with its own build, and
        # publishes both commits so staleness is machine-checkable
        "registry_size": registry,
        "commit": commit,
        "slope_stamp": base.get("slope_stamp"),
        "load_gate": base.get("load_gate"),
        "queries": base.get("queries"),
        "mas_firth_reps": base.get("mas_firth_reps"),
        "mas_firth20_reps": base.get("mas_firth20_reps"),
        "mas_linear_reps": base.get("mas_linear_reps"),
        "mas_firth_gram_reps": base.get("mas_firth_gram_reps"),
        "scale_slope": slope,
    }
    with open("BENCH_SLOPE_EMBED.json", "w", encoding="utf-8") as f:
        json.dump(out, f)
        f.write("\n")
    print(json.dumps(out, indent=1)[:2000])


if __name__ == "__main__":
    main()
