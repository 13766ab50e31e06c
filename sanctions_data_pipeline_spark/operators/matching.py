"""Entity-matching operators (reference main.py:421-522, 809-830,
950-1028), re-expressed as distributed DataFrame transformations.

The reference does dict lookups and sequential row scans on the driver;
here the mapping is a broadcast dimension and the variant probe is an
exploded equi-join — shuffle-free on the probe side at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from sanctions_data_pipeline_spark.functions.names import variant_keys


def build_variant_mapping(entries: DataFrame, name_col: str,
                          id_col: str, value_col: str) -> DataFrame:
    """Reference build_pdf_rem2_mapping (main.py:421-522): each entry
    contributes its 3 normalized name-variant keys; on key collision the
    FIRST entry wins (``if key not in mapping``), modeled by min(id)
    per key. Returns (match_key, <value_col>)."""
    exploded = entries.select(
        F.col(id_col).alias("__mid"),
        F.col(value_col).alias("__mval"),
        F.explode(variant_keys(F.col(name_col))).alias("match_key"),
    ).filter(F.col("match_key") != "")
    w = W.partitionBy("match_key").orderBy("__mid")
    return (
        exploded.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("match_key", F.col("__mval").alias(value_col))
    )


def variant_match(candidates: DataFrame, key_cols: list[str],
                  name_col: str, priority_col: str,
                  mapping: DataFrame, value_col: str) -> DataFrame:
    """Reference candidate loop (main.py:809-830): for each entity, try
    candidate names in priority order, and for each name its 3 variant
    keys in order; the first key present in the mapping wins.

    Distributed form: posexplode the variant keys (priority =
    priority_col * 3 + variant position), broadcast-join the mapping,
    keep the minimum-priority hit per entity."""
    exploded = candidates.select(
        *key_cols,
        F.col(priority_col).alias("__prio"),
        F.posexplode(variant_keys(F.col(name_col))).alias("__vpos", "match_key"),
    )
    hits = exploded.join(F.broadcast(mapping), "match_key")
    w = W.partitionBy(*key_cols).orderBy(
        F.col("__prio").asc(), F.col("__vpos").asc())
    return (
        hits.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*key_cols, F.col(value_col))
    )


def _scan_chunk(vals: list[str], elig: list[bool], carry: str,
                nxt_after: str) -> tuple[list[str], str]:
    """Sequential agreeing-fill scan of ONE contiguous chunk.

    Faithful to the reference's in-place row loop (main.py:950-1028):
    an eligible row fills iff the running carry (last non-empty value
    seen, INCLUDING earlier overwrites in the same pass) equals the
    nearest non-empty ORIGINAL value to the right; a fill writes the
    carry back over the row's own value, so later rows see it.

    Returns per-row fill values ('' = not filled; only meaningful for
    eligible rows) and the outgoing carry.
    """
    n = len(vals)
    nxt = [""] * n
    cur = nxt_after
    for i in range(n - 1, -1, -1):
        nxt[i] = cur
        if vals[i]:
            cur = vals[i]
    cells = [""] * n
    for i in range(n):
        if elig[i] and carry and nxt[i] and carry == nxt[i]:
            cells[i] = carry           # fill; carry value unchanged
        elif vals[i]:
            carry = vals[i]
    return cells, carry


def _chunk_transition(vals: list[str], elig: list[bool],
                      nxt_after: str) -> tuple[str | None, str | None, str | None]:
    """Carry-transition function of a chunk, f(incoming carry) -> outgoing.

    Key algebra (fuzz-verified against the reference loop): a fill
    leaves the carry UNCHANGED (it requires carry == next and writes
    that same value), and a non-fill at a non-empty row sets the carry
    to a constant. So f is the identity on at most ONE special incoming
    value V (the next-value of the first non-empty row, while fills
    chain) and constant everywhere else:

        f(L) = out_v   if V is not None and L == V
               out_gen otherwise            (None means 'L unchanged')
    """
    n = len(vals)
    nxt = [""] * n
    cur = nxt_after
    for i in range(n - 1, -1, -1):
        nxt[i] = cur
        if vals[i]:
            cur = vals[i]

    def sim(carry0: str | None) -> str | None:
        carry, set_any = carry0, False
        for i in range(n):
            if elig[i] and carry and nxt[i] and carry == nxt[i]:
                pass                   # fill; carry unchanged
            elif vals[i]:
                carry, set_any = vals[i], True
        return carry if (set_any or carry0 is not None) else None

    v = None
    for i in range(n):
        if vals[i]:
            if elig[i] and nxt[i]:
                v = nxt[i]
            break
    return v, (sim(v) if v is not None else None), sim(None)


def agreeing_fill_scan(df: DataFrame, order_col: str, value: Column,
                       eligible: Column, base: Column, out_col: str,
                       n_chunks: int | None = None) -> DataFrame:
    """Distributed, exact implementation of the reference's sequential
    agreeing-neighbor fill loop (main.py:950-1028) — NO unpartitioned
    window, no driver-side row loop.

    Three chunk-local passes over deterministic contiguous chunks of
    the global ``order_col`` order (boundaries from approxQuantile, so
    every pass sees identical chunks without caching):

    1. per-chunk first non-empty value      (tiny partial-agg shuffle)
    2. per-chunk carry-transition summary   (slim applyInPandas)
    3. per-chunk sequential fill            (applyInPandas, full rows)

    Driver state is O(n_chunks) summaries; the transitions compose
    exactly because each chunk's carry function is the identity on at
    most one value and constant otherwise (see _chunk_transition).
    ``value`` is the scanned array ('' = empty), ``eligible`` marks
    rows the fill loop may write, ``base`` is the output for
    non-eligible rows. ``order_col`` must be numeric and unique.
    """
    import pandas as pd

    spark = df.sparkSession
    if n_chunks is None:
        n_chunks = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    with_cols = (
        df.withColumn("__v", F.coalesce(value, F.lit("")))
        .withColumn("__e", eligible.cast("boolean"))
        .withColumn("__base", F.coalesce(base, F.lit("")))
    )
    integral = dict(df.dtypes).get(order_col) in ("tinyint", "smallint", "int", "bigint")
    probs = [i / n_chunks for i in range(1, n_chunks)]
    bounds = with_cols.approxQuantile(order_col, probs, 0.001) if probs else []
    bounds = sorted({int(b) if integral else b for b in bounds})
    if bounds:
        barr = F.array(*[F.lit(b) for b in bounds])
        chunk = F.size(F.filter(barr, lambda b: F.col(order_col) > b))
    else:
        chunk = F.lit(0)
    with_cols = with_cols.withColumn("__chunk", chunk.cast("int"))

    # pass 1: first non-empty value per chunk (map-side combinable min_by)
    first_ne = {
        r["__chunk"]: r["fv"]
        for r in with_cols.filter(F.col("__v") != "")
        .groupBy("__chunk").agg(F.min_by("__v", order_col).alias("fv"))
        .collect()
    }
    n_slots = max([n_chunks] + [c + 1 for c in first_ne])
    nxt_after = [""] * n_slots
    cur = ""
    for k in range(n_slots - 1, -1, -1):
        nxt_after[k] = cur
        if first_ne.get(k, ""):
            cur = first_ne[k]

    # pass 2: carry-transition summary per chunk
    def summarize(key, pdf: pd.DataFrame) -> pd.DataFrame:
        cid = int(key[0])
        pdf = pdf.sort_values(order_col)
        v, out_v, out_gen = _chunk_transition(
            list(pdf["__v"]), list(pdf["__e"].fillna(False)), nxt_after[cid])
        return pd.DataFrame([{"__chunk": cid, "v": v,
                              "out_v": out_v, "out_gen": out_gen}])

    summaries = {
        r["__chunk"]: (r["v"], r["out_v"], r["out_gen"])
        for r in with_cols.select("__chunk", order_col, "__v", "__e")
        .groupBy("__chunk")
        .applyInPandas(summarize,
                       "__chunk int, v string, out_v string, out_gen string")
        .collect()
    }
    carry = ""
    carry_in = [""] * n_slots
    for k in range(n_slots):
        carry_in[k] = carry
        v, out_v, out_gen = summaries.get(k, (None, None, None))
        if v is not None and carry == v:
            carry = out_v if out_v is not None else carry
        else:
            carry = out_gen if out_gen is not None else carry

    # pass 3: chunk-local sequential fill with exact boundary state
    from pyspark.sql.types import StringType, StructField, StructType
    out_schema = StructType(
        list(with_cols.schema.fields) + [StructField(out_col, StringType())])

    def fill(key, pdf: pd.DataFrame) -> pd.DataFrame:
        cid = int(key[0])
        pdf = pdf.sort_values(order_col)
        cells, _ = _scan_chunk(
            list(pdf["__v"]), list(pdf["__e"].fillna(False)),
            carry_in[cid], nxt_after[cid])
        pdf = pdf.copy()
        elig = pdf["__e"].fillna(False).to_numpy()
        pdf[out_col] = [c if e else b for c, e, b
                        in zip(cells, elig, pdf["__base"])]
        return pdf

    return (
        with_cols.groupBy("__chunk").applyInPandas(fill, out_schema)
        .drop("__v", "__e", "__base", "__chunk")
    )


def neighbor_fill(df: DataFrame, order_col: str, name_col: str,
                  cand_col: str, out_col: str = "filled",
                  flag_col: str | None = None,
                  state_col: str | None = None,
                  third_pass: bool = False) -> DataFrame:
    """Reference duplicate-name passes (main.py:950-1028): rows whose
    name is unique keep their candidate; 'UNKNOWN' rows blank out;
    duplicate names take the nearest non-empty candidate BEFORE (as
    updated by earlier fills in the same pass — the reference loop
    writes back into ``rem2_candidates``) and AFTER (original values)
    in the global row order, filled only when the two agree.

    Distributed via :func:`agreeing_fill_scan` — chunk-local scans with
    exact boundary-state exchange, no unpartitioned window.

    ``third_pass=True`` additionally applies the reference's third pass
    (main.py:995-1028): duplicates still empty adopt the nearest
    non-empty OUTPUT cells (again sequential, earlier third-pass writes
    visible) when prev == next.

    ``flag_col`` marks rows whose final value differs from their own
    candidate (came from neighbor inference). ``state_col`` emits the
    reference's three-state cell verdict (main.py:994-1047):
    'filled' | 'empty_unique' (yellow: UNKNOWN or unique-and-empty) |
    'conflict' (red: duplicate left empty — pass-3 fills clear it).
    """
    n_occ = F.count(F.lit(1)).over(W.partitionBy(name_col))
    df2 = df.withColumn("__n_occ", n_occ)
    dup = (F.col(name_col) != "UNKNOWN") & (F.col("__n_occ") > 1)
    base2 = (F.when(F.col(name_col) == "UNKNOWN", F.lit(""))
             .otherwise(F.coalesce(F.col(cand_col), F.lit(""))))
    out = agreeing_fill_scan(df2, order_col, F.col(cand_col), dup, base2, out_col)
    if third_pass:
        elig3 = dup & (F.col("__p2") == "")
        out = agreeing_fill_scan(
            out.withColumnRenamed(out_col, "__p2"), order_col,
            F.col("__p2"), elig3, F.col("__p2"), out_col).drop("__p2")
    if flag_col:
        inferred = ((F.col(out_col) != "")
                    & (F.col(out_col) != F.coalesce(F.col(cand_col), F.lit(""))))
        out = out.withColumn(
            flag_col, F.when(inferred, 1).otherwise(0).cast("bigint"))
    if state_col:
        out = out.withColumn(
            state_col,
            F.when(F.col(out_col) != "", F.lit("filled"))
            .when((F.col(name_col) == "UNKNOWN") | (F.col("__n_occ") == 1),
                  F.lit("empty_unique"))
            .otherwise(F.lit("conflict")))
    return out.drop("__n_occ")
