"""Property tests (hypothesis): normalization invariants the pipeline
relies on. Each example batch evaluates in ONE Spark job over a literal
DataFrame, keeping runtime sane."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from sanctions_data_pipeline_spark.functions import names as nm
from sanctions_data_pipeline_spark.operators.dedup import normalized_text

_SETTINGS = dict(max_examples=10, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])

text_lists = st.lists(
    st.text(alphabet=st.characters(blacklist_categories=("Cs",)),
            max_size=40),
    min_size=1, max_size=25)


def _eval(spark, strings, fn):
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    return [r["a"] for r in
            df.select(fn(F.col("s")).alias("a")).collect()]


@given(text_lists)
@settings(**_SETTINGS)
def test_clean_fullname_idempotent(spark, strings):
    once = _eval(spark, strings, nm.clean_fullname)
    twice = _eval(spark, once, nm.clean_fullname)
    assert twice == once


@given(text_lists)
@settings(**_SETTINGS)
def test_normalized_text_idempotent(spark, strings):
    once = _eval(spark, strings, normalized_text)
    twice = _eval(spark, once, normalized_text)
    assert twice == once


@given(text_lists)
@settings(**_SETTINGS)
def test_variant_keys_are_lowercase_and_ws_collapsed(spark, strings):
    rows = _eval(spark, strings, nm.variant_keys)
    for variants in rows:
        for v in variants:
            assert v == v.lower()
            assert "  " not in v
            # trim semantics are Java \s (NOT Python str.strip, which
            # also eats \x1c-\x1f separators)
            assert not v.startswith(" ") and not v.endswith(" ")


@given(text_lists)
@settings(**_SETTINGS)
def test_normalize_ws_output_has_no_runs(spark, strings):
    for s in _eval(spark, strings, nm.normalize_ws):
        assert "  " not in s
        assert not s.startswith(" ") and not s.endswith(" ")


@given(st.lists(st.lists(st.floats(min_value=-10, max_value=10,
                                   allow_nan=False, width=32),
                         min_size=4, max_size=8),
                min_size=1, max_size=10))
@settings(**_SETTINGS)
def test_quantization_error_bounded_by_half_step(spark, vecs):
    """floor(x*scale+0.5) must never be off by more than half a
    quantization step, and the extreme element must hit ±127."""
    vecs = [v for v in vecs if max(abs(x) for x in v) > 1e-6]
    if not vecs:
        return
    from pyspark.sql import functions as F
    from sanctions_data_pipeline_spark.functions.hof import let
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vecs)],
                               "vec_id long, embedding array<float>")
    absmax = F.array_max(F.transform("embedding",
                                     lambda x: F.abs(x.cast("double"))))
    qv = lambda scale: F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("bigint"))
    rows = df.select("vec_id", "embedding",
                     let(F.lit(127.0) / absmax, qv).alias("q")).collect()
    for r in rows:
        v = [float(x) for x in r.embedding]
        scale = 127.0 / max(abs(x) for x in v)
        for x, q in zip(v, r.q):
            assert -128 <= q <= 127
            assert abs(q / scale - x) <= (0.5 / scale) + 1e-9
        assert max(abs(q) for q in r.q) == 127


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.text(alphabet="abcdef ", min_size=0, max_size=40),
                min_size=1, max_size=8))
def test_span_count_law(spark, texts):
    """Every document yields exactly max(0, n_tokens - k + 1) k-spans
    (with multiplicity), for the same whitespace normalization the
    engine applies everywhere."""
    from sanctions_data_pipeline_spark.operators.dedup import span_hashes

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    rows = df.select(
        "doc_id",
        F.size(F.split(normalized_text(F.col("text")), " ")).alias("n"),
        F.size(span_hashes(F.col("text"), 4)).alias("n_spans")).collect()
    for r in rows:
        # normalized empty text still splits to [""] (one empty token)
        expect = max(0, r.n - 4 + 1) if r.n >= 4 else 0
        assert r.n_spans == expect


def test_dp_shuffle_addresses_ignore_physical_partitioning(spark, sf_dir):
    """The (shard, pos) address must be a pure function of doc_id —
    identical under any input partitioning (the property that makes the
    training order reproducible on any cluster size)."""
    from sanctions_data_pipeline_spark.plans import registry

    q = registry.queries()["dp_shuffle"]
    base = {(r.doc_id, r.shard, r.pos) for r in q(spark, sf_dir).collect()}
    from sanctions_data_pipeline_spark.catalog import load_table
    from pyspark.sql import Window as W
    docs = load_table(spark, sf_dir, "documents").repartition(7)
    addressed = docs.select(
        "doc_id",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2).alias("shard"),
        F.md5(F.concat(F.lit("shuffle:"), F.col("doc_id").cast("string")))
         .alias("h"))
    w = W.partitionBy("shard").orderBy("h", "doc_id")
    other = {(r.doc_id, r.shard, r.pos) for r in addressed.select(
        "doc_id", "shard",
        F.row_number().over(w).cast("bigint").alias("pos")).collect()}
    assert base == other


@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 1000)),
                min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_interval_merge_laws(spark, points):
    """Interval-union laws on the q_interval_merge kernel: islands per
    user are disjoint AND non-touching, every input interval lies
    inside exactly one island, and n_events partitions the inputs."""
    from pyspark.sql import Window as W

    L = 30  # interval length
    iv = spark.createDataFrame(
        [(u, s, s + L) for u, s in points], "user_id int, s long, e long")
    w = W.partitionBy("user_id").orderBy("s", "e")
    prev_max = F.max("e").over(w.rowsBetween(W.unboundedPreceding, -1))
    brk = F.when(F.col("s") > prev_max, 1).otherwise(0)
    out = (iv.withColumn("__brk", brk)
           .withColumn("__i", F.sum("__brk").over(
               w.rowsBetween(W.unboundedPreceding, 0)))
           .groupBy("user_id", "__i")
           .agg(F.min("s").alias("start"), F.max("e").alias("end"),
                F.count(F.lit(1)).alias("n")))
    islands: dict[int, list] = {}
    for r in out.collect():
        islands.setdefault(r.user_id, []).append((r.start, r.end, r.n))
    for u, isl in islands.items():
        isl.sort()
        for (s1, e1, _), (s2, e2, _) in zip(isl, isl[1:]):
            assert e1 < s2  # strictly disjoint, gap preserved
        mine = [(s, s + L) for uu, s in points if uu == u]
        assert sum(n for _, _, n in isl) == len(mine)
        for s, e in mine:
            assert sum(1 for si, ei, _ in isl if si <= s and e <= ei) == 1


# --------------------------------------------------------------------------
# Winnowing guarantee (Schleimer et al. 2003, Theorem: any match of
# length >= w + k - 1 is caught): two token streams sharing a common
# run of w + k - 1 tokens must share at least one selected fingerprint.
# Pure-python replay of the dd_winnow selection (same md5 hashes).
# --------------------------------------------------------------------------
_WTOK = st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
                 min_size=0, max_size=12)


def _winnow_fps(toks, k=3, w=4):
    import hashlib

    if len(toks) < k:
        return set()
    hs = [int(hashlib.md5(" ".join(toks[i:i + k]).encode())
              .hexdigest()[:15], 16) for i in range(len(toks) - k + 1)]
    if len(hs) < w:
        return set()
    return {min(hs[i:i + w]) for i in range(len(hs) - w + 1)}


@given(_WTOK, _WTOK, st.lists(st.sampled_from(
    ["pp", "qq", "rr", "ss", "tt", "uu", "vv", "ww"]),
    min_size=6, max_size=10, unique=True))
@settings(**_SETTINGS)
def test_winnowing_guarantee_shared_run_shares_fingerprint(pre, post, run):
    # run is >= w + k - 1 = 6 distinct tokens, absent from pre/post
    a = pre + run + post
    b = run  # second doc is exactly the shared run
    fa, fb = _winnow_fps(a), _winnow_fps(b)
    assert fb  # the run alone is long enough to fingerprint
    assert fa & fb, (a, b)


@given(st.lists(st.text(alphabet="abcd", min_size=1, max_size=12),
                min_size=1, max_size=15),
       st.lists(st.text(alphabet="abcd", min_size=2, max_size=4),
                min_size=0, max_size=8))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_unigram_viterbi_hof_lattice_laws(spark, words, pieces):
    """For ANY piece model (all single chars + arbitrary multi-char
    pieces, arbitrary positive weights), the JVM HOF lattice must (a)
    agree exactly with the python DP and (b) emit pieces that
    concatenate back to the word."""
    from sanctions_data_pipeline_spark.operators import unigram as ug

    vocab = {c: 1.0 for c in "abcd"}
    for i, p in enumerate(pieces):
        vocab[p] = float(2 + (i % 3))
    tot = sum(vocab.values())
    model = {p: v / tot for p, v in vocab.items()}

    df = spark.createDataFrame([(w,) for w in set(words)], "w string")
    got = {r.w: list(r.p)
           for r in df.select("w", ug.viterbi_pieces(F.col("w"), model)
                              .alias("p")).collect()}
    for w in set(words):
        assert "".join(got[w]) == w
        assert got[w] == ug.viterbi_pieces_py(w, model)
