"""Training-batch preparation operators: sequence packing, training-order
shuffle, cross-document repeated-span statistics, and a logistic quality
classifier.

These cover the last mile of an LLM data pipeline — after cleaning/dedup the
corpus must be (a) scored and gated one more time, (b) stripped of spans the
corpus repeats verbatim (Lee et al., "Deduplicating Training Data Makes
Language Models Better" — repeated spans are memorization fuel), (c) shuffled
into a reproducible training order, and (d) packed into fixed-length token
sequences (the concat-and-chunk layout GPT-style loaders consume).

Every operator is deterministic and engine-portable (md5 keys + plain integer
arithmetic), so each one carries an exact DuckDB oracle. Scale notes are per
function; the common theme is that nothing here needs a global order — all
window functions are partitioned by a hash bucket/shard so the work
parallelizes bucket-wise at any corpus size.

Reference parity note: the reference server has no training-prep operators —
these extend the surface for LLM pipelines per the project's extension
mandate (same status as pipeline/sampling.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ophidia_server_spark.pipeline.text import tokens


def _md5_bucket(key: Column, n: int, salt: str) -> Column:
    """Uniform bucket in [0, n) from the shared md5 primitive
    (functions/hashing.py) — identical in Spark and DuckDB, which is what
    makes the packing/shuffle layouts oracle-checkable."""
    from ophidia_server_spark.functions.hashing import md5_bucket

    return md5_bucket(key, n, salt)


def pack_sequences(
    df: DataFrame,
    seq_len: int = 128,
    n_buckets: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "pack",
) -> DataFrame:
    """Concat-and-chunk sequence packing plan: lay the corpus out as
    fixed-length token sequences and report, per document, where its tokens
    land — bucket, start offset, and the first/last sequence ids it occupies
    (documents straddle sequence boundaries, as in GPT-style loaders).

    Layout: documents are hash-assigned to `n_buckets` independent streams
    (so packing needs NO global order — the only window is partitioned by
    bucket), concatenated within a stream in id order, and cut every
    `seq_len` tokens. Global sequence id = bucket * ceil(max_stream/L) would
    need a second pass, so sequence ids are per-bucket (bucket, seq_no) —
    exactly how a sharded dataset addresses its samples.

    Scale shape: one map stage for token counts, one window per bucket
    (running sum — at 100 TB pick n_buckets ~ shard count, e.g. 8-64k, so
    each window partition holds corpus/n_buckets rows), zero joins. The
    running sum is the only shuffle.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    counted = df.select(
        F.col(id_col),
        _md5_bucket(F.col(id_col), n_buckets, salt).alias("bucket"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    end = start + F.col("n_tokens")
    first_seq = F.floor(start / seq_len)
    last_seq = F.when(
        F.col("n_tokens") > 0, F.floor((end - 1) / seq_len)
    ).otherwise(first_seq)
    return counted.select(
        id_col,
        "bucket",
        "n_tokens",
        start.cast("long").alias("start_offset"),
        first_seq.cast("long").alias("first_seq"),
        last_seq.cast("long").alias("last_seq"),
        F.when(F.col("n_tokens") > 0, last_seq - first_seq + 1)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_seqs_spanned"),
    )


def pack_bins(
    df: DataFrame,
    max_len: int = 2048,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "binpack",
) -> DataFrame:
    """First-fit-decreasing BIN packing — the padding-minimizing
    alternative to concat-and-chunk when documents must stay whole
    (instruction tuning, contrastive batches): each bin holds whole
    documents totalling <= max_len tokens, and FFD's classic guarantee
    bounds waste at 11/9 OPT + 1 bins per stream.

    Distributed shape: documents hash to `n_buckets` independent streams
    (same layout idea as pack_sequences — no global order), and each
    stream packs with an Arrow-batched applyInPandas running the
    DETERMINISTIC greedy (sort by tokens DESC then id ASC, place into the
    first bin that fits). Per-task memory is one bucket's (id, len) pairs
    — at 100 TB pick n_buckets ~ shard count so a bucket fits a task.
    Documents longer than max_len get a dedicated bin with oversize=1
    (the loader's truncation decision, not the packer's).

    Output: (id, n_tokens, bucket, bin_id, bin_offset, oversize) with
    bin_id unique within its bucket."""
    import pandas as pd

    if max_len <= 0:
        raise ValueError(f"max_len must be positive, got {max_len}")
    counted = df.select(
        F.col(id_col),
        _md5_bucket(F.col(id_col), n_buckets, salt).alias("bucket"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    )

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(
            ["n_tokens", id_col], ascending=[False, True], kind="mergesort"
        )
        bins: list[int] = []  # remaining capacity per open bin
        rows = {id_col: [], "n_tokens": [], "bucket": [], "bin_id": [],
                "bin_offset": [], "oversize": []}
        for did, bkt, n in zip(pdf[id_col], pdf["bucket"], pdf["n_tokens"]):
            n = int(n)
            if n > max_len:
                bins.append(-1)  # closed: oversize singleton
                b, off, ovs = len(bins) - 1, 0, 1
            else:
                for b, cap in enumerate(bins):
                    if cap >= n:
                        break
                else:
                    bins.append(max_len)
                    b = len(bins) - 1
                off, ovs = max_len - bins[b], 0
                bins[b] -= n
            rows[id_col].append(did)
            rows["n_tokens"].append(n)
            rows["bucket"].append(int(bkt))
            rows["bin_id"].append(b)
            rows["bin_offset"].append(off)
            rows["oversize"].append(ovs)
        return pd.DataFrame(rows)

    return counted.groupBy("bucket").applyInPandas(
        pack,
        f"{id_col} long, n_tokens long, bucket long, bin_id long, "
        "bin_offset long, oversize int",
    )


def global_shuffle(
    df: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    salt: str = "epoch0",
) -> DataFrame:
    """Deterministic training-order shuffle: every row gets a shard in
    [0, n_shards) and a position within its shard, both derived only from
    md5(id, salt) — change the salt to get a fresh, reproducible epoch order.

    This is the distributed replacement for "shuffle the dataset": a loader
    reads shards in any order and rows within a shard by position, and the
    visit order is uniform-random-like yet identical across runs, engines and
    partitionings. No global sort: the only window is per-shard (corpus/
    n_shards rows each; at 100 TB use thousands of shards), the shard
    assignment is a pure map.
    """
    from ophidia_server_spark.functions.hashing import md5_of

    key = md5_of(F.col(id_col), salt)
    keyed = df.select(
        F.col(id_col),
        _md5_bucket(F.col(id_col), n_shards, salt + ":shard").alias("shard"),
        key.alias("sort_key"),
    )
    w = Window.partitionBy("shard").orderBy("sort_key", id_col)
    return keyed.select(
        id_col,
        "shard",
        (F.row_number().over(w) - 1).cast("long").alias("pos"),
    )


def repeated_ngram_stats(
    df: DataFrame,
    k: int = 3,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document repeated-span statistics: for each document, the
    fraction of its k-gram occurrences that also appear in >= min_docs
    distinct documents corpus-wide. High fractions mark boilerplate /
    verbatim-repeated spans — the signal behind exact-substring dedup
    (Lee et al. 2022): such spans are disproportionately memorized, so
    pipelines either drop the docs or cut the spans.

    Shape at scale: explode per-doc k-grams into distinct (doc, gram)
    occurrence counts, compute document frequency with a term-keyed
    `groupBy("gram").agg(count)` and join it back on gram (the same shape
    remove_repeated_spans uses). Natural text gram keys ARE skewed — a
    stop-phrase like "one of the" lands one row per containing document on
    a single key — which is exactly why the frequency is an aggregate, not
    a gram-partitioned window: map-side partial aggregation collapses the
    hot key to one row per input partition before the shuffle, where a
    window would funnel the gram's whole corpus-wide posting into one
    straggler task. The join back is gram-keyed hash-to-hash (the hot gram
    is one row on the frequency side, so the probe stays balanced); the
    vocabulary is never broadcast and never collected. The occurrence
    table is checkpointed once (round-13 opt, guide §2.4) so the
    tokenize+explode+aggregate pass runs ONCE and both join sides read the
    materialization — the same lifecycle dedup.duplicate_spans gives its
    occurrence table; previously each side re-ran the full O(tokens) scan
    (3 source scans in plans/r13/text_repeated_ngrams_before.txt).
    """
    from ophidia_server_spark.ckpt import checkpoint as _ckpt
    from ophidia_server_spark.pipeline.dedup import _shingles

    pairs = _ckpt(
        df.select(F.col(id_col), F.explode(_shingles(text_col, k)).alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count("*").alias("__c"))
    )
    dfreq = pairs.groupBy("gram").agg(F.count("*").alias("__df"))
    per_doc = (
        pairs.join(dfreq, "gram")
        .groupBy(id_col)
        .agg(
            F.sum("__c").alias("n_grams"),
            F.sum(
                F.when(F.col("__df") >= min_docs, F.col("__c")).otherwise(F.lit(0))
            ).alias("n_repeated"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_repeated", F.lit(0)).cast("long").alias("n_repeated"),
            F.round(
                F.coalesce(
                    F.col("n_repeated") / F.nullif(F.col("n_grams"), F.lit(0)),
                    F.lit(0.0),
                ),
                6,
            ).alias("repeated_frac"),
        )
    )


# Default logistic weights: intercept + per-feature coefficients, chosen to
# reward mid-length documents with sane stopword density and token lengths.
# A trained model (pyspark.ml LogisticRegression / a distilled fastText) drops
# into the same shape — the operator is the serving plan, not the training.
QUALITY_LOGISTIC_WEIGHTS = {
    "intercept": -3.0,
    "log_tokens": 0.8,       # ln(1 + n_tokens)
    "stopword_ratio": 4.0,
    "mean_token_len": 0.15,
}


def quality_logistic(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    keep_threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Model-based quality gate: a logistic classifier over the document's
    quality features (the serving half of a fastText/linear quality filter —
    CCNet/GPT-3-style "looks like curated text" scoring).

        p = sigmoid(w0 + w1*ln(1+n_tokens) + w2*stopword_ratio
                       + w3*mean_token_len)

    Pure map stage (tokenize once, three array folds, one exp) — fuses into
    the scan's codegen span; the weights are plan literals, so at 100 TB this
    is a single pushed-projection pass with zero shuffle.
    """
    from ophidia_server_spark.pipeline.text import STOPWORDS

    w = dict(QUALITY_LOGISTIC_WEIGHTS, **(weights or {}))
    toked = df.select("doc_id", tokens(F.col(text_col)).alias("__toks"))
    toks = F.col("__toks")
    feats = toked.select(
        "doc_id",
        F.size(toks).alias("__n"),
        F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS))).alias("__stop"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
        ).alias("__chars"),
    )
    n = F.col("__n").cast("double")
    sr = F.when(n > 0, F.col("__stop") / n).otherwise(F.lit(0.0))
    mt = F.when(n > 0, F.col("__chars") / n).otherwise(F.lit(0.0))
    z = (
        F.lit(w["intercept"])
        + F.lit(w["log_tokens"]) * F.log(F.lit(1.0) + n)
        + F.lit(w["stopword_ratio"]) * sr
        + F.lit(w["mean_token_len"]) * mt
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return feats.select(
        "doc_id",
        F.round(p, 6).alias("quality_prob"),
        (p >= keep_threshold).cast("int").alias("keep"),
    )


def remove_repeated_spans(
    df: DataFrame,
    k: int = 3,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-substring dedup, removal half (Lee et al. 2022): delete every
    token position covered by a k-gram that appears in >= min_docs distinct
    documents, and rebuild the text from the surviving tokens. Unlike
    whole-document dedup this cuts the repeated SPANS (boilerplate headers,
    license blocks, templated fragments) while keeping the unique remainder.
    This is the remove-EVERYWHERE policy (the passage leaves the corpus
    entirely — right for boilerplate); dedup.excise_duplicate_spans is the
    keep-one-copy sibling (the min-doc owner's occurrence survives — right
    for legitimate content that happens to be syndicated), and
    dedup.duplicate_spans reports the spans without cutting.

    Shape at scale: one posexplode to (doc, pos, gram); gram document
    frequency over distinct (doc, gram) pairs (term-keyed, never
    broadcast); flagged occurrences explode to their k covered positions
    and collect into a per-doc sorted set (bounded by the doc's token
    count); the rebuild is a zip-with-index filter — all array exprs, no
    Python. Docs with no flagged span pass through with n_removed = 0.
    """
    toked = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    # shingles over the already-tokenized array (the array-input fold below)
    # — going back through dedup._shingles would double-tokenize the text
    grams = toked.select(
        id_col,
        F.posexplode(_shingles_from_tokens(F.col("__toks"), k)).alias("pos", "gram"),
    )
    dfreq = (
        grams.select(id_col, "gram").distinct()
        .groupBy("gram")
        .agg(F.count("*").alias("__df"))
    )
    covered = (
        grams.join(dfreq.filter(F.col("__df") >= min_docs), "gram", "left_semi")
        .select(id_col, F.explode(F.sequence(F.col("pos"), F.col("pos") + k - 1)).alias("p"))
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_set("p")).alias("__cut"))
    )
    joined = toked.join(covered, id_col, "left").select(
        id_col,
        "__toks",
        F.coalesce("__cut", F.array().cast("array<int>")).alias("__cut"),
    )
    kept = F.filter(
        F.zip_with(
            F.col("__toks"),
            F.sequence(F.lit(0), F.greatest(F.size("__toks") - 1, F.lit(0))),
            lambda t, i: F.struct(t.alias("t"), i.alias("i")),
        ),
        lambda s: ~F.array_contains(F.col("__cut"), s["i"]),
    )
    return joined.select(
        id_col,
        F.size("__cut").cast("long").alias("n_removed"),
        F.concat_ws(" ", F.transform(kept, lambda s: s["t"])).alias("clean_text"),
    )


def _shingles_from_tokens(toks: Column, k: int) -> Column:
    """k-gram shingles over an existing token array (the array-input form
    of dedup._shingles, same zip_with fold)."""
    n = F.size(toks)
    sh = toks
    for j in range(1, k):
        sh = F.zip_with(
            sh, F.slice(toks, j + 1, F.greatest(n - j, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.slice(sh, 1, F.greatest(n - (k - 1), F.lit(0)))


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    scope: str = "corpus",
) -> DataFrame:
    """C4-style duplicate-LINE removal (Raffel et al. 2020 §2.2 dedupes
    three-sentence spans corpus-wide; the line variant is what most
    open pipelines ship): split each document into lines, keep only the
    FIRST occurrence of every distinct line across the whole corpus
    (first = lowest (doc_id, line_no), the deterministic engine-portable
    tiebreak), and rebuild each document from its surviving lines.
    scope="doc" dedupes within each document only (cheaper; kills
    boilerplate repeated inside a page without cross-doc coupling).

    Plan: one posexplode, ONE line-keyed grouped min to find each line's
    first owner (map-side partials absorb hot boilerplate lines — the
    same de-skew shape as repeated_ngram_stats' document frequency), a
    semi-join back on (line, owner), and a per-doc sort_array rebuild.
    Line text itself is the shuffle key, so identical lines co-locate
    without any broadcast of a line vocabulary."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_no", "line"),
    ).filter(F.trim("line") != "")
    if scope == "doc":
        keep = lines.groupBy(id_col, "line").agg(
            F.min("line_no").alias("line_no")
        )
    elif scope == "corpus":
        first = lines.groupBy("line").agg(
            F.min(F.struct(id_col, "line_no")).alias("__first")
        )
        keep = first.select(
            F.col(f"__first.{id_col}").alias(id_col),
            F.col("__first.line_no").alias("line_no"),
            "line",
        )
    else:
        raise ValueError(f"unknown scope {scope!r} (corpus|doc)")
    rebuilt = (
        keep.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("line_no", "line"))),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("dedup_text"),
            F.count(F.lit(1)).cast("long").alias("n_lines_kept"),
        )
    )
    totals = lines.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines")
    )
    return (
        df.select(id_col)
        .join(totals, id_col, "left")
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("dedup_text", F.lit("")).alias("dedup_text"),
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.coalesce("n_lines_kept", F.lit(0)).alias("n_lines_kept"),
        )
    )


def fim_split(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    middle_frac: float = 0.3,
    min_tokens: int = 8,
    salt: str = "fim",
) -> DataFrame:
    """Fill-in-the-middle training samples (the public FIM formulation —
    Bavarian et al. 2022, "Efficient Training of Language Models to Fill
    in the Middle"): split each document's token stream into
    (prefix, middle, suffix) around a deterministically chosen span, so
    the loader can emit PSM/SPM permutations. The span is content-
    addressed — start offset = md5-coin(id, salt) % (n - m + 1), middle
    length m = max(1, floor(n * middle_frac)) — so the dataset is
    byte-reproducible across runs and engines (change `salt` for a fresh
    epoch of cuts; compose with sampling.hash_sample upstream to apply a
    FIM rate < 1).

    Documents shorter than `min_tokens` pass through whole (fim = false,
    text in `prefix`, empty middle/suffix) — nothing is silently dropped.
    Returns (id_col, n_tokens, fim, prefix, middle, suffix). Pure map
    stage: one md5 + three array slices per row, zero shuffle at any
    corpus size."""
    if not 0.0 < float(middle_frac) < 1.0:
        raise ValueError(
            f"middle_frac must be in (0, 1), got {middle_frac}"
        )
    if int(min_tokens) < 2:
        raise ValueError(f"min_tokens must be >= 2, got {min_tokens}")
    from ophidia_server_spark.functions.hashing import hex8_long
    from ophidia_server_spark.pipeline.text import tokens

    toks = tokens(F.col(text_col))
    n = F.size(toks)
    m = F.greatest(
        F.lit(1), F.floor(n * F.lit(float(middle_frac))).cast("int")
    )
    eligible = n >= int(min_tokens)
    # the If branch is evaluated lazily, so the pmod divisor (n - m + 1)
    # is only touched when eligible (it is 0 for empty docs, which ANSI
    # mode would reject)
    s = F.when(
        eligible, F.pmod(hex8_long(F.col(id_col), salt), n - m + 1)
    ).otherwise(F.lit(0)).cast("int")
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        eligible.alias("fim"),
        F.when(eligible, F.concat_ws(" ", F.slice(toks, 1, s)))
        .otherwise(F.concat_ws(" ", toks)).alias("prefix"),
        F.when(eligible, F.concat_ws(" ", F.slice(toks, s + 1, m)))
        .otherwise(F.lit("")).alias("middle"),
        F.when(
            eligible,
            F.concat_ws(
                " ",
                F.slice(toks, s + m + 1, F.greatest(n - s - m, F.lit(0))),
            ),
        ).otherwise(F.lit("")).alias("suffix"),
    )
