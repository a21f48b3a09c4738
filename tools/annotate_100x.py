#!/usr/bin/env python3
"""Annotate BENCH_100x_full.json with the named causes the r12 verdict
requires for every gate growing faster than ~linear (>10x/decade; the
worst_curve's per_decade is sqrt(t_100x / sf0.1 floor), so linear
corpus-proportional scaling reads as 10x/decade) plus the two designed
timeouts. Also classifies every worst_curve row: sub-linear (<8.5),
~linear (8.5-11), super-linear (>11)."""
import json, sys

art = json.load(open("/root/repo/BENCH_100x_full.json"))

for r in art["worst_curve"]:
    pd = r["per_decade"]
    r["class"] = ("super-linear" if pd > 11.0 else
                  "~linear" if pd > 8.5 else "sub-linear")

semscale = None
try:
    semscale = json.loads(sys.argv[1])
except Exception:
    pass

art["named_causes"] = {
    "d04_embed_dup (timeout 900s)": (
        "DESIGNED comparator: the unguarded hyperplane-band embedding "
        "self-join -- every (band,sig) bucket self-joins uncapped. Its "
        "guarded twin d20 (identical-vector star collapse + banding on "
        "representatives) reads 3.7 s on the same corpus; d04 is kept as "
        "the gate that prices what the guard buys (BENCH_SKEW 10x-skew: "
        "153 s vs 6.7 s)."),
    "st10_stream_decontam (timeout 900s)": (
        "DESIGNED defect class st11 exists to retire: st10's benchmark "
        "side is a corpus FRACTION (%97 slice), so Bloom-FP suspects x "
        "bench rows in the broadcast-nested-loop anti verify grow "
        "quadratically with the corpus. The fixed-64-doc twin st11 reads "
        "18.4 s / 4.6x-per-decade (sub-linear) on the same stream -- the "
        "production contract (eval suites are fixed artifacts)."),
    "g04_articlerank (640 s, 24.0x/decade)": (
        "GUARD FLIP, not super-linear execution: the sf0.1 floor (1.1 s) "
        "runs the broadcast pull path; at 100x the vertex probe (1.6M > "
        "1M broadcastVertexLimit) flips to the GraphX shuffle fallback, "
        "so the two decades compare different plans. The fallback itself "
        "is measured LINEAR at 80x (BENCH_GUARDFLIP: 263.9 s isolated at "
        "64g ~= the 10x GraphX reading x8); the 640 s here is reps=1 "
        "under suite memory pressure at 48g. 20 Pregel supersteps over "
        "117M symmetrized edges is the honest cost of exact ArticleRank "
        "at this scale on one box; a 1000-executor cluster spreads the "
        "per-superstep shuffle, which is the design point."),
    "d11_semantic_dedup (154 s, 15.0x/decade)": (
        "FIXED-k QUADRATIC BY GATE CONVENTION: the oracle pins the "
        "16-seed-centroid convention, so within-cluster cosine pairs "
        "grow as 16*(N/16)^2. The documented production path is "
        "semanticDedupTrained with k ~ sqrt(N), bounding pairs at "
        "~N*sqrt(N)/2"
        + (": measured on this corpus -- trained k=%d reads %.1f s vs "
           "the seeded-16 gate form's %.1f s (tools.SemDedupScale)."
           % (semscale["k_sqrtN"], semscale["trained_sqrtN_sec"],
              semscale["seeded_16_sec"]) if semscale else "."),
    ),
    "t23_curate_learned (170 s, 6.7x/decade)": (
        "Gate form keeps the corpus-global rank window by design "
        "(oracle-pinned); the scale twin t25 (approx_percentile cutoff, "
        "auto-k) reads 3.7 s on the same corpus -- the documented "
        "production path."),
    "everything else over 4x/decade": (
        "All remaining rows are <= 8.4x/decade = growing SLOWER than the "
        "corpus (ratio < 70 for 100x data): fixed overheads amortizing "
        "over linear plans. reps=1 carries +-2x run-to-run noise at this "
        "scale (d02 read 49 s in one run, 98 s in another, same code) -- "
        "adjudicate individual gates against the min-of-3 floors in "
        "BENCH_10x/BENCH_SKEW before reading a single-run number as a "
        "trend."),
}
art["harness_note"] = (
    "First 100x pass caught a real harness bug: cancelJobGroup cannot "
    "kill a STREAMING gate (the stream execution thread runs micro-batch "
    "jobs under its own group), so st10's timed-out quadratic drain kept "
    "running and contaminated every later gate (st11 read 517 s dirty vs "
    "18.4 s clean; g04 857 s dirty vs 640 s clean). Bench now stops "
    "active streaming queries on timeout and between gates; this "
    "artifact is the clean re-run.")
if semscale:
    art["semdedup_scale_probe"] = semscale

json.dump(art, open("/root/repo/BENCH_100x_full.json", "w"), indent=1)
sup = [r["gate"] for r in art["worst_curve"] if r["class"] == "super-linear"]
print("annotated; super-linear gates:", sup)
