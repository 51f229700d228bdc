"""Data-quality expectation checks — the validation gate of a pipeline.

Before a corpus (or an event feed) flows downstream, a pipeline asserts
expectations: required columns non-null, values in range, keys unique,
categories in a known set. This module evaluates a rule set in ONE pass
and returns a violations summary — the "expectations report" that gates
promotion of a dataset version.

Scale: every rule is a column predicate, so the whole report is a single
scan with map-side partial counts (one conditional sum per rule) — no
shuffle at all for row-level rules; the uniqueness rule adds one
digest-keyed aggregation, the only key-shaped work in the report.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pypond_spark.datapipe._util import global_prefix_sums


def expect(df: DataFrame, rules: Mapping[str, Column | str]) -> DataFrame:
    """Evaluate named expectations; each rule is a Column/SQL predicate
    that should hold for EVERY row.

    Output: one row per rule — ``rule, n_rows, n_violations, pass``
    (``pass`` iff no violations). NULL predicate results count as
    violations (an expectation that cannot be evaluated did not hold).

    One scan, zero shuffles: all rules are conditional counts in a single
    global aggregate.
    """
    if not rules:
        raise ValueError("expect() needs at least one rule")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, pred in rules.items():
        p = F.expr(pred) if isinstance(pred, str) else pred
        aggs.append(
            F.sum(F.when(~F.coalesce(p, F.lit(False)), 1).otherwise(0))
            .alias(name))
    row = df.agg(*aggs)
    pairs = [
        F.struct(F.lit(name).alias("rule"),
                 F.col(name).alias("n_violations"))
        for name in rules]
    return (row.select(F.col("__n").alias("n_rows"),
                       F.explode(F.array(*pairs)).alias("r"))
            .select(F.col("r.rule").alias("rule"), "n_rows",
                    F.col("r.n_violations").alias("n_violations"),
                    (F.col("r.n_violations") == 0).alias("pass")))


def expect_unique(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Uniqueness expectation: ``rule, n_rows, n_violations, pass`` where
    violations = rows beyond the first per key. One digest-keyed
    aggregation (uniform key), output is a single row."""
    per = df.groupBy(key_col).count()
    return (per.agg(F.sum("count").alias("n_rows"),
                    F.sum(F.col("count") - 1).alias("n_violations"))
            .select(F.lit(f"unique_{key_col}").alias("rule"), "n_rows",
                    "n_violations",
                    (F.col("n_violations") == 0).alias("pass")))


def psi(df: DataFrame, field: str, split: Column | str,
        bin_width: float = 1.0, smooth: float = 0.5,
        partition_by=()) -> DataFrame:
    """Population Stability Index between two slices of one table — the
    standard production-ML drift check ("has this feature's distribution
    moved between baseline and current?"; rule of thumb: < 0.1 stable,
    0.1-0.25 drifting, > 0.25 shifted).

    ``split`` is a boolean predicate marking the CURRENT slice (false =
    baseline). Values floor-bin at ``bin_width`` (fixed edges — no stats
    pass, deterministic across engines); each observed bin contributes
    ``(q - p) * ln(q / p)`` with Laplace-smoothed shares
    ``p = (c_base + smooth) / (n_base + smooth * B)`` over the B bins
    observed in either slice, so empty-on-one-side bins stay finite.
    Invalid values (NULL/NaN) are excluded from both slices.

    Output: per (group, bin) rows ``(*partition_by, bin, lo, c_base,
    c_cur, p_base, p_cur, contrib)`` — ``sum(contrib)`` per group is the
    PSI. Scale: ONE shuffle bounded by groups x occupied bins (map-side
    partial counts), then per-group totals broadcast back onto the tiny
    bin frame.
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be > 0, got {bin_width}")
    if smooth <= 0:
        # smooth=0 turns any one-sided bin into q/0 -> ANSI
        # DIVIDE_BY_ZERO (or an infinite contrib); PSI needs smoothing
        # to be defined on disjoint supports
        raise ValueError(f"smooth must be > 0, got {smooth}")
    keys = list(partition_by)
    col = F.col(field).cast("double")
    valid = col.isNotNull() & ~F.isnan(col)
    pred = F.expr(split) if isinstance(split, str) else split
    binned = (df.where(valid)
              .select(*keys,
                      F.floor(col / F.lit(float(bin_width))).alias("bin"),
                      F.coalesce(pred, F.lit(False)).alias("__cur")))
    counts = (binned.groupBy(*keys, "bin")
              .agg(F.sum(F.when(~F.col("__cur"), 1).otherwise(0))
                   .alias("c_base"),
                   F.sum(F.when(F.col("__cur"), 1).otherwise(0))
                   .alias("c_cur"))
              # bins x groups rows; materialize so the totals branch and
              # the join read it instead of re-scanning the corpus (the
              # un-checkpointed plan runs the corpus aggregation twice)
              .localCheckpoint())
    totals = (counts.groupBy(*keys)
              .agg(F.sum("c_base").alias("__nb"),
                   F.sum("c_cur").alias("__nc"),
                   F.count("*").alias("__B")))
    joined = counts.join(F.broadcast(totals), keys) if keys \
        else counts.crossJoin(F.broadcast(totals))
    s = F.lit(float(smooth))
    p = (F.col("c_base") + s) / (F.col("__nb") + s * F.col("__B"))
    q = (F.col("c_cur") + s) / (F.col("__nc") + s * F.col("__B"))
    return joined.select(
        *keys, "bin",
        (F.col("bin") * F.lit(float(bin_width))).alias("lo"),
        "c_base", "c_cur",
        p.alias("p_base"), q.alias("p_cur"),
        ((q - p) * F.log(q / p)).alias("contrib"))


def mutual_information(df: DataFrame, x_col: Column | str,
                       y_col: Column | str) -> DataFrame:
    """Mutual information audit between two categorical columns —
    MI(X;Y) = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))) in nats, plus the marginal
    entropies and the normalized MI (MI/sqrt(H(X)H(Y))).  The feature-
    association check a pipeline runs before trusting a stratification
    key ("is `source` just a proxy for `lang`?") or after a drift alarm
    (PSI says WHAT moved; MI says what it moved WITH).

    One corpus-sized shuffle (the joint groupBy); marginals, totals and
    the term sum all run on the cells-sized joint table (|X|·|Y| rows),
    with the 1-row total broadcast.  Rows with NULL in either column
    are excluded (standard contingency-table semantics).

    Determinism (the dsir_weights discipline): each cell's term is
    pinned to nano-nats (round(term·1e9) as BIGINT) before the
    order-independent integer sum; counts and count-products stay exact
    BIGINTs, so the only floats are one division, one ``ln`` and one
    multiply per cell — a SQL twin reproduces the hash exactly.

    Output: one row ``(n, cells, mi_nats, h_x, h_y, nmi)``.
    """
    x = F.col(x_col) if isinstance(x_col, str) else x_col
    y = F.col(y_col) if isinstance(y_col, str) else y_col
    base = df.where(x.isNotNull() & y.isNotNull()) \
        .select(x.alias("__x"), y.alias("__y"))
    # the joint table feeds four consumers (marginals, totals, terms);
    # localCheckpoint materializes the ONE corpus-sized shuffle so the
    # plan re-reads |X|*|Y| cells instead of re-aggregating the corpus
    joint = (base.groupBy("__x", "__y").agg(F.count("*").alias("__c"))
             .localCheckpoint())
    mx = joint.groupBy("__x").agg(F.sum("__c").alias("__cx"))
    my = joint.groupBy("__y").agg(F.sum("__c").alias("__cy"))
    nn = joint.agg(F.sum("__c").alias("__n"),
                   F.count("*").alias("__cells"))
    t = (joint.join(mx, "__x").join(my, "__y")
         .crossJoin(F.broadcast(nn)))
    term = ((F.col("__c") / F.col("__n"))
            * F.log((F.col("__n") * F.col("__c"))
                    / (F.col("__cx") * F.col("__cy"))))
    ent = lambda c: (c / F.col("__n")) * F.log(c / F.col("__n"))  # noqa: E731
    mic = F.round(term * 1e9).cast("long")
    hxc = F.round(ent(F.col("__cx")) * 1e9).cast("long")
    hyc = F.round(ent(F.col("__cy")) * 1e9).cast("long")
    agg = t.agg(
        F.first("__n").alias("n"),
        F.first("__cells").alias("cells"),
        F.round(F.sum(mic) / 1e9, 6).alias("mi_nats"))
    hx = (mx.crossJoin(F.broadcast(nn))
          .agg(F.round(-F.sum(hxc) / 1e9, 6).alias("h_x")))
    hy = (my.crossJoin(F.broadcast(nn))
          .agg(F.round(-F.sum(hyc) / 1e9, 6).alias("h_y")))
    out = agg.crossJoin(F.broadcast(hx)).crossJoin(F.broadcast(hy))
    nmi = F.when((F.col("h_x") > 0) & (F.col("h_y") > 0),
                 F.round(F.col("mi_nats")
                         / F.sqrt(F.col("h_x") * F.col("h_y")), 6)) \
        .otherwise(F.lit(0.0))
    return out.select("n", "cells", "mi_nats", "h_x", "h_y",
                      nmi.alias("nmi"))


def chi_squared(df: DataFrame, x_col: Column | str,
                y_col: Column | str) -> DataFrame:
    """Pearson chi-squared independence audit between two categorical
    columns: ``X² = Σ (observed - expected)²/expected`` over the FULL
    r×k grid (zero-observed cells contribute their expectation), plus
    degrees of freedom and Cramér's V — the significance-flavored
    companion to :func:`mutual_information` (MI says how much the
    columns share; V says how far from independence relative to table
    size).

    Same shape as MI: ONE corpus-sized shuffle (the joint groupBy,
    localCheckpointed for its consumers); the grid is the marginals'
    cross join (|X|·|Y| rows).  Terms are pinned to nano-units before
    the order-independent BIGINT sum; everything upstream of the one
    division is exact integer counts, so the SQL twin hash-matches.

    Output: one row ``(n, cells, dof, chi2, cramers_v)`` — ``cells``
    counts OBSERVED cells, ``dof = (r-1)(k-1)``.
    """
    x = F.col(x_col) if isinstance(x_col, str) else x_col
    y = F.col(y_col) if isinstance(y_col, str) else y_col
    base = df.where(x.isNotNull() & y.isNotNull()) \
        .select(x.alias("__x"), y.alias("__y"))
    joint = (base.groupBy("__x", "__y").agg(F.count("*").alias("__c"))
             .localCheckpoint())
    mx = joint.groupBy("__x").agg(F.sum("__c").alias("__cx"))
    my = joint.groupBy("__y").agg(F.sum("__c").alias("__cy"))
    nn = joint.agg(F.sum("__c").alias("__n"),
                   F.count("*").alias("__cells"))
    grid = (mx.crossJoin(my)
            .join(joint, ["__x", "__y"], "left")
            .crossJoin(F.broadcast(nn))
            .select("__cx", "__cy", "__n",
                    F.coalesce("__c", F.lit(0)).alias("__c")))
    e = (F.col("__cx") * F.col("__cy")) / F.col("__n")
    term = (F.col("__c") - e) * (F.col("__c") - e) / e
    tmic = F.round(term * 1e9).cast("long")
    rk = (mx.agg(F.count("*").alias("__r"))
          .crossJoin(my.agg(F.count("*").alias("__k"))))
    agg = (grid.agg(F.round(F.sum(tmic) / 1e9, 6).alias("chi2"))
           .crossJoin(F.broadcast(nn))
           .crossJoin(F.broadcast(rk)))
    dof = (F.col("__r") - 1) * (F.col("__k") - 1)
    denom = F.col("__n") * F.least(F.col("__r") - 1, F.col("__k") - 1)
    v = F.when(denom > 0,
               F.round(F.sqrt(F.col("chi2") / denom), 6)) \
        .otherwise(F.lit(0.0))
    return agg.select(F.col("__n").alias("n"),
                      F.col("__cells").alias("cells"),
                      dof.alias("dof"), "chi2",
                      v.alias("cramers_v"))


def isotonic_calibration(df: DataFrame, score_col: Column | str,
                         target_col: Column | str, bins: int = 10,
                         quantize: int = 6) -> DataFrame:
    """Isotonic (monotone non-decreasing) calibration of a score
    against an outcome — "does a higher quality score actually mean a
    higher pass rate, and what IS the calibrated rate per score
    level?".  The pool-adjacent-violators fit is computed through the
    exact minimax identity ``iso_i = max_{j<=i} min_{k>=i}
    mean(target | bin j..k)`` (Ayer et al. 1955; Robertson-Wright-
    Dykstra 1988 §1.2) — pure joins over the B-bin frame, NO sequential
    recursion, so both the Spark plan and the SQL twin are flat.

    Binning is rank-cumulative over the QUANTIZED score (the
    competition-rank recipe): one corpus-sized groupBy onto the
    distinct-value frame, an ordered window over THAT bounded frame
    (never the corpus), ``bin = min(B-1, floor(cum_before*B/N))`` in
    exact integers — ties never straddle a boundary, no corpus-wide
    ntile.  Targets accumulate as micro-unit BIGINTs; every pooled
    mean is one BIGINT/BIGINT division, so min/max comparisons are
    deterministic doubles and the twin hash-matches.

    Output: one row per non-empty bin — ``(bin, n, score_lo,
    score_hi, rate_raw, rate_iso)`` with ``rate_iso`` monotone in
    ``bin``.
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    sc = F.col(score_col) if isinstance(score_col, str) else score_col
    tg = F.col(target_col) if isinstance(target_col, str) else target_col
    base = df.where(sc.isNotNull() & tg.isNotNull()).select(
        F.round(sc.cast("double"), quantize).alias("__v"),
        F.round(F.round(tg.cast("double"), 6) * 1e6).cast("long")
        .alias("__t"))
    vals = (base.groupBy("__v")
            .agg(F.count("*").alias("__w"), F.sum("__t").alias("__s")))
    # exclusive prefix count in score order via the distributed
    # two-pass recipe: the distinct-value frame is bounded by
    # 10^quantize per unit of score range, which for continuous scores
    # is still far too large for a single-task window
    pre0 = global_prefix_sums(vals, [F.col("__v")], ["__w"],
                              prefix="__cb_")
    nn = pre0.agg(F.sum("__w").alias("__n"))
    binned = (pre0
              .withColumnRenamed("__cb___w", "__cb")
              .crossJoin(F.broadcast(nn))
              .withColumn("__bin", F.least(
                  F.lit(bins - 1),
                  F.floor(F.col("__cb") * bins / F.col("__n")))))
    bf = (binned.groupBy("__bin")
          .agg(F.sum("__w").alias("__bw"), F.sum("__s").alias("__bs"),
               F.min("__v").alias("score_lo"),
               F.max("__v").alias("score_hi"))
          .localCheckpoint())
    # prefix sums over the <=B-row bin frame
    wp = Window.orderBy("__bin").rowsBetween(Window.unboundedPreceding, 0)
    pre = (bf.select("__bin", "__bw", "__bs",
                     F.sum("__bw").over(wp).alias("__cw"),
                     F.sum("__bs").over(wp).alias("__cs"))
           .select("__bin", "__cw", "__cs",
                   (F.col("__cw") - F.col("__bw")).alias("__pw"),
                   (F.col("__cs") - F.col("__bs")).alias("__ps")))
    # segment means m(j,k) = pooled target mean over bins j..k, from
    # exact BIGINT prefix differences; ONE double division each, so
    # every m is deterministic cross-engine.  Every frame below is at
    # most B or B^2 rows (B^3 join work) — all broadcast.
    a = pre.select(F.col("__bin").alias("__j"),
                   F.col("__pw").alias("__pwj"),
                   F.col("__ps").alias("__psj"))
    b = pre.select(F.col("__bin").alias("__k"),
                   F.col("__cw").alias("__cwk"),
                   F.col("__cs").alias("__csk"))
    segs = (a.crossJoin(F.broadcast(b))
            .where(F.col("__j") <= F.col("__k"))
            .select("__j", "__k",
                    ((F.col("__csk") - F.col("__psj"))
                     / (F.col("__cwk") - F.col("__pwj"))).alias("__m")))
    # minimax: iso_i = max_{j<=i} min_{k>=i} m(j,k)  (j<=i and k>=i
    # imply k>=j, so every referenced segment exists)
    idx = pre.select(F.col("__bin").alias("__i"))
    inner = (segs.join(F.broadcast(idx),
                       (F.col("__j") <= F.col("__i"))
                       & (F.col("__k") >= F.col("__i")))
             .groupBy("__i", "__j").agg(F.min("__m").alias("__mn")))
    iso = inner.groupBy("__i").agg(F.max("__mn").alias("__iso"))
    return (bf.join(iso, bf["__bin"] == iso["__i"])
            .select(F.col("__bin").alias("bin"),
                    F.col("__bw").alias("n"),
                    "score_lo", "score_hi",
                    F.round(F.col("__bs") / F.col("__bw") / 1e6, 6)
                    .alias("rate_raw"),
                    F.round(F.col("__iso") / 1e6, 6).alias("rate_iso"))
            .orderBy("bin"))


def calibrate_scores(df: DataFrame, fit: DataFrame,
                     score_col: Column | str,
                     out_col: str = "rate_calibrated",
                     quantize: int = 6) -> DataFrame:
    """Apply an :func:`isotonic_calibration` fit as a step function:
    each row's (quantized) score maps to the ``rate_iso`` of the LAST
    fitted bin whose ``score_lo`` does not exceed it — the standard
    right-continuous isotonic step — with scores below the first bin
    clamping to bin 0.  Monotone by construction because the fit is.

    The fit frame is <= B rows and the step value depends ONLY on the
    quantized score, so the theta-join (``score >= score_lo``) + argmax
    runs over the DISTINCT quantized scores — a frame bounded by score
    cardinality, not corpus size — and the per-score rate joins back on
    the quantized value (null-safe, so NULL scores keep their bin-0
    clamp).  Input columns pass through untouched (grouping on every
    input column would shuffle the full row as the key and raise
    AnalysisException for non-groupable columns like MapType), and no
    generated row id is needed — the recompute hazard of joining a
    frame back to itself on ``monotonically_increasing_id`` never
    arises.  Adds ``out_col`` (and keeps every input column).
    """
    sc = F.col(score_col) if isinstance(score_col, str) else score_col
    qv = F.round(sc.cast("double"), quantize)
    marked = df.withColumn("__qv", qv)
    fit_b = F.broadcast(fit.select(F.col("bin").alias("__bin"),
                                   F.col("score_lo").alias("__lo"),
                                   F.col("rate_iso").alias("__ri")))
    rates = (marked.select("__qv").distinct()
             .join(fit_b, (F.col("__qv") >= F.col("__lo"))
                   | (F.col("__bin") == 0), "left")
             .groupBy("__qv")
             .agg(F.max_by(F.col("__ri"),
                           F.when(F.col("__qv") >= F.col("__lo"),
                                  F.col("__bin")).otherwise(F.lit(-1)))
                  .alias(out_col)))
    return (marked.join(rates.withColumnRenamed("__qv", "__qr"),
                        F.col("__qv").eqNullSafe(F.col("__qr")), "left")
            .drop("__qv", "__qr"))
