#!/usr/bin/env python3
"""Build BENCH_SLOPE_EMBED.json from one or more quiet slopemas runs.

Usage: make_slope_embed.py <log_or_json>:<source_label> [more...]
                           [--sweep <log_or_json>:<source_label>]

Each argument is a path to a Bench log (or bare JSON line file) and a
short source label, colon-separated. The FIRST file is the base: its
headline mins (queries), rep arrays, stamp convention, load_gate and
registry_size are taken whole. Later files MERGE their scale_slope
families over the base (later wins per family) — the adjudication
path for expensive families measured in a dedicated min-of-2 run
(e.g. g02) without re-paying them in the base run. Per-family source
labels are recorded in slope_sources so a reader can trace every row
to its run. slope_reps (raw min-of-N rep arrays, the published spread
behind a pinned point) merge the same way.

--sweep names the QUIET full-sweep run whose total becomes
sweep_total/sweep_gate/sweep_total_source: the wrapper bench then
publishes that as its `value` (its own live total as `value_live`),
so BENCH_r{N}.json alone never advertises a contaminated total
(r17 verdict item 3).

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
    sweep_spec = None
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sweep":
            i += 1
            a = args[i]
            path, _, label = a.rpartition(":")
            if not path:
                sys.exit(f"--sweep argument '{a}' must be <path>:<label>")
            sweep_spec = (path, label)
        else:
            path, _, label = a.rpartition(":")
            if not path:
                sys.exit(f"argument '{a}' must be <path>:<label>")
            specs.append((path, label))
        i += 1
    if not specs:
        sys.exit(__doc__)
    base = read_last(specs[0][0])
    slope = dict(base.get("scale_slope") or {})
    sources = {k: specs[0][1] for k in slope if k != "docs"}
    slope_reps = dict(base.get("slope_reps") or {})
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
        for k, v in (d.get("slope_reps") or {}).items():
            slope_reps[k] = v
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
        # core count the base run measured at (r21 advice: the Bench
        # cpu-staleness gate is reader-side; the producer must emit the
        # field or a non-32-core pin would silently read as 32-core).
        # Bench emits "cpus" since r22; refuse to build an embed from a
        # log that lacks it rather than bake in the legacy default.
        "cpus": base.get("cpus") if base.get("cpus") is not None else sys.exit(
            "base log has no 'cpus' field - re-run Bench (r22+) so the "
            "embed records its core count; refusing to default to 32"),
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
    if slope_reps:
        out["slope_reps"] = slope_reps
    if sweep_spec is not None:
        sw = read_last(sweep_spec[0])
        if sw.get("registry_size") not in (None, registry):
            print(f"note: sweep {sweep_spec[0]} ran at "
                  f"registry_size={sw.get('registry_size')} vs base {registry}")
        out["sweep_total"] = sw.get("value")
        out["sweep_gate"] = sw.get("load_gate")
        out["sweep_total_source"] = sweep_spec[1]
    with open("BENCH_SLOPE_EMBED.json", "w", encoding="utf-8") as f:
        json.dump(out, f)
        f.write("\n")
    print(json.dumps(out, indent=1)[:2000])


if __name__ == "__main__":
    main()
