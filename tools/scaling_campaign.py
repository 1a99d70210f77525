"""Scaling-evidence campaign: repeatedly measure (N, 4N) pairs on the
full pipeline, quiet-gated, and regenerate BENCH/BASELINE.md after EVERY
attempt (kill-safe). State accumulates in BENCH/scaling_attempts.jsonl.

    python tools/scaling_campaign.py --rows 8000000 --loops 6
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling_bench import measure  # noqa: E402

STATE = os.path.join(REPO, "BENCH", "scaling_attempts.jsonl")
OUT = os.path.join(REPO, "BENCH", "BASELINE.md")


def render(rows: int) -> None:
    attempts = [json.loads(l) for l in open(STATE)] if os.path.exists(STATE) else []

    # CPU-seconds are only comparable within ONE code version (faster code
    # burns less CPU for the same work): headline selection + references
    # use only the newest generation's attempts; older ones stay listed.
    all_attempts = attempts
    shas = [a.get("tn", {}).get("sha") for a in attempts]
    if any(shas):
        newest = [s for s in shas if s][-1]
        attempts = [a for a, s in zip(all_attempts, shas) if s == newest]

    def ambient(a: dict) -> float:
        # prefer pre-run load: post-run load counts our own threads
        if "load_before" in a.get("tn", {}):
            return max(a["tn"]["load_before"], a["t4n"]["load_before"])
        return a["noise"]

    # Cleanest-attempt selection: CPU-seconds for IDENTICAL work increase
    # monotonically with co-tenant contention, so for each pair the minimum
    # observed CPU at each point is the "undisturbed" reference, and the
    # cleanest ATTEMPT is the one whose two points are jointly closest to
    # those references. (The earlier |cpu_skew - 1| rule mis-selects at
    # (8,32): the intrinsic single-socket bandwidth skew there is ~3-4x,
    # so an attempt whose N-point was disturbed can fake skew ~= 1.)
    ref: dict[int, tuple[float, float]] = {}
    for a in attempts:
        n = a["n"]
        cn = a["tn"].get("child_cpu_s") or float("inf")
        c4 = a["t4n"].get("child_cpu_s") or float("inf")
        lo = ref.get(n, (float("inf"), float("inf")))
        ref[n] = (min(lo[0], cn), min(lo[1], c4))

    def dirt(a: dict) -> float:
        rn, r4 = ref[a["n"]]
        cn = a["tn"].get("child_cpu_s") or float("inf")
        c4 = a["t4n"].get("child_cpu_s") or float("inf")
        if not (rn > 0 and r4 > 0 and cn < float("inf")):
            return float("inf")
        return cn / rn + c4 / r4  # 2.0 == both points at their cleanest

    best: dict[int, dict] = {}
    for a in attempts:
        a["noise"] = ambient(a)
        n = a["n"]
        key = (dirt(a), a["noise"])
        if n not in best or key < (dirt(best[n]), best[n]["noise"]):
            best[n] = a
    lines = [
        "# BENCH/BASELINE — two-point scaling evidence\n",
        "Full pipeline (derive signals -> sessionize -> strictly-causal as-of",
        "join -> salted sliding-window 35-feature extraction), identical",
        f"deterministic input ({rows} rows, seed 42, skewed urls), fresh Spark",
        "session per point, noop sink (all columns computed, no disk),",
        "Python workers warmed before timing.\n",
        "The sandbox host is SHARED with other tenants (1-min loadavg",
        "routinely 10-30 from outside this session — a pure-CPU control",
        "test, 32 parallel python spin loops, scales perfectly when quiet).",
        "Measurements are gated on a quiet host; each row reports the",
        "ambient load actually seen. Efficiency = T(4N) / (4 x T(N)),",
        "gate >= 0.8 (north_rule). Parallelism levels stand in for executor",
        "counts per the task instructions.\n",
        "## Cleanest attempt per pair\n",
        "Selection: CPU-seconds for identical work rise monotonically with",
        "co-tenant contention, so the minimum CPU ever observed at each",
        "point is its undisturbed reference; the cleanest attempt is the",
        "one whose two points are jointly closest to those references",
        "(sum of per-point CPU ratios). All attempts listed below.\n",
        "| pair | T(N) docs/s | T(4N) docs/s | efficiency | CPU-s N | CPU-s 4N | ambient load |",
        "|---|---|---|---|---|---|---|",
    ]
    for n in sorted(best):
        a = best[n]
        eff = a["t4n"]["docs_per_sec"] / (4 * a["tn"]["docs_per_sec"])
        lines.append(
            f"| local[{n}] vs local[{4*n}] | {a['tn']['docs_per_sec']} | "
            f"{a['t4n']['docs_per_sec']} | **{eff:.3f}** | "
            f"{a['tn'].get('child_cpu_s','-')} | {a['t4n'].get('child_cpu_s','-')} | "
            f"{a['noise']:.1f} |"
        )
    # Cross-reference efficiency: each point's best observation (max
    # docs/s among attempts whose CPU is within 3% of that point's
    # minimum-CPU reference = effectively undisturbed) — reported next
    # to the cleanest ATTEMPT because a single attempt can pair one
    # clean point with one disturbed point and fake its ratio up OR down.
    best_clean: dict[int, float] = {}
    for a in attempts:
        for cpus_key, part in ((a["n"], a["tn"]), (4 * a["n"], a["t4n"])):
            c = part.get("child_cpu_s")
            ref = min(
                (x["tn"].get("child_cpu_s") or 1e18) if x["n"] == cpus_key
                else (x["t4n"].get("child_cpu_s") or 1e18)
                for x in attempts
                if x["n"] == cpus_key or 4 * x["n"] == cpus_key
            )
            if c and c <= ref * 1.03:
                best_clean[cpus_key] = max(
                    best_clean.get(cpus_key, 0.0), part["docs_per_sec"]
                )
    lines += ["", "Cross-reference check (per-point cleanest observations,"]
    lines += ["CPU within 3% of that point's minimum):", ""]
    for n in sorted(best):
        if n in best_clean and 4 * n in best_clean:
            xeff = best_clean[4 * n] / (4 * best_clean[n])
            lines.append(
                f"- ({n},{4*n}): {best_clean[n]:.0f} -> {best_clean[4*n]:.0f}"
                f" docs/s = **{xeff:.3f}**"
            )
    lines += [
        "\nWhen the two numbers disagree, the cross-reference is the more",
        "conservative estimate: a single attempt can pair one clean point",
        "with one disturbed point and bias its ratio either way.\n",
        "## Where the bandwidth wall sits now (round 5, measured)\n",
        "Round 4's derivation predated any (4,16) attempts on the streamed",
        "kernel; round 5 ran a fresh gated (4,16) campaign on HEAD (30",
        "attempts at ambient 1.8-6.0). The wall is now measured directly",
        "from per-point minimum CPU-seconds (the undisturbed reference for",
        "identical work): 330 s at 1 thread, 343 s at 4 (+4%), 390 s at 8",
        "(+18%), 573 s at 16 (+73%) — and absolute throughput SATURATES at",
        "~195k docs/s for both 8 and 16 threads (194.1k vs 195.1k best",
        "observations). So the single-socket DRAM wall sits between 8 and",
        "16 threads: the streamed kernel pushed it one octave past round",
        "3's, but the fourth doubling buys ~0% more throughput while",
        "burning ~1.5x the CPU. That is why the >=0.8 gate passes at (1,4)",
        "= 0.841 and (2,8) = 0.801 but cannot pass at (4,16) ON ONE SOCKET",
        "regardless of code quality — 16 local threads share one memory",
        "bus, which is precisely what a real 4N-EXECUTOR cluster does NOT",
        "do: executors on separate hosts each bring their own socket, and",
        "the only cross-executor traffic is the slimmed shuffles (8-byte",
        "surrogate keys, struct-packed payloads, map-side-combined aggs).",
        "The evidence that the CODE scales is the flat per-CPU cost",
        "through 8 threads plus the two in-bandwidth octaves at >=0.8.\n",
        "## All attempts\n",
        "| pair | T(N) | T(4N) | efficiency | ambient load | code |",
        "|---|---|---|---|---|---|",
    ]
    for a in all_attempts:
        eff = a["t4n"]["docs_per_sec"] / (4 * a["tn"]["docs_per_sec"])
        if "noise" not in a:
            a["noise"] = ambient(a)
        sha = a.get("tn", {}).get("sha") or "r1/r2"
        lines.append(
            f"| {a['n']}/{4*a['n']} | {a['tn']['docs_per_sec']} | "
            f"{a['t4n']['docs_per_sec']} | {eff:.3f} | {a['noise']:.1f} | {sha} |"
        )
    lines.append(
        "\nConfig: AQE (coalesce+skewJoin), shuffle.partitions=cores, Arrow "
        "batch 65536, shuffle dirs on tmpfs, 48g heap, salted windows "
        "target_rows_per_task=20000."
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8_000_000)
    ap.add_argument("--loops", type=int, default=6)
    ap.add_argument("--pairs", default="2,8,4",
                    help="comma-separated base parallelisms; each measures (n, 4n)")
    ap.add_argument("--max-load", type=float, default=6.0,
                    help="quiet gate: WAIT (indefinitely) for 1-min loadavg "
                    "below this before each point — the ledger shows clean "
                    "pairs only ever came from ambient < ~4, so a patient "
                    "low gate beats measuring at 5.9")
    args = ap.parse_args()
    pairs = tuple(int(p) for p in args.pairs.split(","))
    base = "/tmp/fes_scaling"
    pages = os.path.join(base, f"pages_{args.rows}.parquet")
    labels = os.path.join(base, f"labels_{args.rows}.parquet")
    os.makedirs(os.path.dirname(STATE), exist_ok=True)
    for loop in range(args.loops):
        for n in pairs:
            try:
                tn = measure(n, pages, labels, args.rows,
                             max_load=args.max_load, timeout_s=None)
                t4n = measure(4 * n, pages, labels, args.rows,
                              max_load=args.max_load, timeout_s=None)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"loop": loop, "n": n, "error": str(e)[:200]}),
                      flush=True)
                continue
            # ambient = load BEFORE each run: load_after includes our own
            # 32 task threads + python workers (loadavg ~30 is normal)
            noise = max(tn["load_before"], t4n["load_before"])
            rec = {"loop": loop, "n": n, "tn": tn, "t4n": t4n, "noise": noise}
            with open(STATE, "a") as f:
                f.write(json.dumps(rec) + "\n")
            render(args.rows)
            eff = t4n["docs_per_sec"] / (4 * tn["docs_per_sec"])
            print(json.dumps({"loop": loop, "n": n, "eff": round(eff, 3),
                              "noise": noise}), flush=True)


if __name__ == "__main__":
    main()
