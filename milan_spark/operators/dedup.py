"""Deduplication operators for LLM data pipelines (SURVEY.md §7 phase 6).

Four families, all shuffle-scalable DataFrame plans (no driver-side loops):

- exact       — hash group-by on content, earliest id survives;
- n-gram Jaccard — exact pairwise similarity, corpus-adaptive between a
  prefix-filtered inverted index and a distributed dense-intersection block
  matmul (see :func:`ngram_jaccard_pairs`);
- MinHash+LSH — signature = min over shingle hashes under k affine
  permutations; banding buckets candidates (join on a single band-hash long),
  candidates are verified with the exact Jaccard so the output contains no
  false positives, and banding (32 bands × 4 rows) keeps the false-negative
  probability at the 0.8 threshold below 5e-8 per pair (1e-14 at j ≥ 0.9)
  while keeping sub-threshold pairs OUT of the candidate set — the knob that
  decides whether the candidate join is feasible at corpus scale;
- SimHash     — 62-bit majority-vote fingerprint over token hashes; banded
  into 4 × 16-bit chunks for candidate generation (Hamming ≤ 3 ⇒ at least one
  chunk matches exactly), verified with bit_count(xor).

Heavy per-element math (permutation minima, intersection counting) runs as
Arrow-vectorized numpy kernels where the SQL-expression form would evaluate
interpreted per array element; all candidate generation and verification
joins stay JVM-side. All verification arithmetic is integer-exact, so every
pipeline is reproducible bit-for-bit and oracle-checkable in ANSI SQL.

At 100 TB these are the standard distributed formulations: the shingle
inverted index and LSH band buckets shuffle on content-derived keys (uniform
by construction); multi-pass operators persist their small derived indexes,
never the input text.
"""

from __future__ import annotations

import pandas as pd  # module-level so pandas_udf annotations resolve under PEP 563

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from milan_spark.operators.text import P31, token_hash62, tokenize


def exact_dedup(df: DataFrame, content_cols, id_col: str) -> DataFrame:
    """Exact dedup: group identical content, earliest id survives.

    Output: content group survivors with duplicate counts. Map-side partial
    aggregation applies; survivors join back by id if full rows are needed.
    """
    if isinstance(content_cols, str):
        content_cols = [content_cols]
    return df.groupBy(*content_cols).agg(
        F.min(id_col).alias("survivor_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def shingles(tokens: Column, n: int) -> Column:
    """Distinct word n-grams of a token array (empty when < n tokens)."""
    grams = F.transform(
        F.sequence(F.lit(1), F.array_size(tokens) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
    )
    return F.when(F.array_size(tokens) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def _shingle_sets(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(__id, __sh: array<long>) — distinct hashed word n-grams per doc.

    Tokens are projected FIRST so the shingle lambda references a bound
    column, not the tokenize expression: inlined, the regex would re-run per
    shingle position (CollapseProject keeps the two-step split because the
    alias is non-cheap and multiply referenced). No emptiness filter either:
    pushed below the projection it would evaluate the shingle expression
    twice per row, and empty sets are inert downstream anyway.

    Shingles are represented as hashes of the n token hashes — never the
    joined strings: no per-position string building, and dedup/intersection
    run on longs. Distinctness matches string-shingle distinctness modulo
    xxhash64 collisions (~|sh|²/2⁶⁵ per doc — vanishing), the same collision
    class the downstream join keys already accept.
    """
    toks = df.select(F.col(id_col).alias("__id"), tokenize(text_col).alias("__tk"))
    th = toks.select("__id", F.transform("__tk", lambda t: F.xxhash64(t)).alias("__th"))
    # n-gram hash = rotate-xor combine of n consecutive token hashes, built by
    # zip_with over shifted slices: the slices evaluate once per ROW and the
    # lambda is pure bit arithmetic (overflow-free under ANSI mode) — no
    # per-element array indexing or re-hashing. Inputs are xxhash64-random,
    # so pair collisions stay at the 2⁻⁶⁴ scale.
    m = F.array_size("__th") - (n - 1)
    acc = F.slice("__th", 1, m)

    def rot_xor(a, b):
        rot = F.shiftleft(a, 21).bitwiseOR(F.shiftrightunsigned(a, 43))
        return rot.bitwiseXOR(b)

    for j in range(1, n):
        acc = F.zip_with(acc, F.slice("__th", j + 1, m), rot_xor)
    sh = F.when(F.array_size("__th") >= n, F.array_distinct(acc)).otherwise(
        F.array().cast("array<long>")
    )
    return th.select("__id", sh.alias("__sh"))


def _verify_jaccard(cands: DataFrame, sets: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard on candidate pairs via array_intersect on the shingle sets."""
    a = sets.select(F.col("__id").alias("id_a"), F.col("__sh").alias("__sh_a"))
    b = sets.select(F.col("__id").alias("id_b"), F.col("__sh").alias("__sh_b"))
    shared = F.array_size(F.array_intersect("__sh_a", "__sh_b"))
    union = F.array_size("__sh_a") + F.array_size("__sh_b") - shared
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", shared.cast("double") / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    threshold: float = 0.8,
    dense_max_cells: int = 64_000_000,
) -> DataFrame:
    """Exact near-duplicate pairs: Jaccard over distinct word n-grams ≥
    threshold. Corpus-adaptive between two exact plans, chosen from measured
    index statistics (vocabulary size V, corpus size N):

    - **Prefix-filtered inverted index** (default): a doc's *prefix* is its
      ``|s| - floor(τ·|s|) + 1`` globally-rarest shingles (ascending
      doc-frequency, hash tie-break). Any pair with J ≥ τ shares ≥ τ·max(na,
      nb) shingles, so by pigeonhole each side's prefix contains a shared
      shingle — joining the FULL index against the PREFIX-only index finds
      every true pair (Bayardo et al., "Scaling Up All Pairs Similarity
      Search", WWW'07). Fan-out on a shingle with doc-frequency f drops from
      f² to f·g with g ≪ f its prefix-frequency — stop-shingles are indexed
      by almost no prefixes, exactly the rows that blow up the naive
      self-join. Candidates (size-ratio pruned) are verified with the exact
      array-intersect Jaccard.
    - **Dense intersection matmul** (when V·N ≤ ``dense_max_cells``):
      templated/boilerplate corpora invert the regime — V tiny, every shingle
      a stop-shingle with f ≈ N, so the index self-join degenerates to ~V·N²
      rows. Instead each doc becomes a V-wide 0/1 row; a distributed
      block-pair BLAS matmul (:func:`_jaccard_dense` — no driver collect, no
      corpus broadcast) yields ALL pairwise intersection counts exactly
      (counts < 2²⁴ are exact in float32). Shingles with f = 1 are dropped
      from the vocab (they intersect nothing); true set sizes still drive
      the union term.

    Both plans emit identical results; thresholds/rounding match the SQL
    formulation bit-for-bit. When neither regime is tractable the corpus is
    pathologically self-similar and the approximate paths
    (:func:`minhash_lsh_pairs`, :func:`simhash_pairs`) are the scale answer.
    """
    sets = _shingle_sets(df, id_col, text_col, n)
    ex = sets.select(
        "__id", F.array_size("__sh").alias("__n"), F.explode("__sh").alias("__h")
    )
    # the shingle pipeline feeds the stats probe, both sides of the join, and
    # (dense path) two more passes — persist the small index, not the text
    ex = ex.persist()
    # persisted: the regime probe counts it, and the sparse path re-joins it
    # for prefix ranking — one row per distinct shingle, tiny
    freq = ex.groupBy("__h").agg(F.count(F.lit(1)).alias("__f")).persist()
    nontrivial = freq.filter(F.col("__f") >= 2)
    # regime probe: ONE action/job over the persisted index (the round-2
    # two-action probe — nontrivial.count() + df.count() — paid two job
    # launches and re-scanned the source; both stats ride one job here).
    # n_docs counts docs with ≥1 shingle — shingle-less docs never pair, so
    # they are irrelevant to both the regime choice and the dense matrix size
    probe = (
        nontrivial.agg(F.count(F.lit(1)).alias("__v"))
        .crossJoin(ex.agg(F.count_distinct("__id").alias("__nd")))
        .first()
    )
    v, n_docs = probe["__v"], probe["__nd"]
    if v * n_docs <= dense_max_cells:
        return _jaccard_dense(ex, nontrivial, threshold)

    sets = sets.persist()  # verify join reuses the shingle arrays
    # prefix size n - floor(τ·n) + 1: floor (not the textbook ceil) absorbs
    # the float representation of τ — floor(τᵈᵇˡ·n) never exceeds the real
    # ⌈τ·n⌉, so the prefix is at worst one element longer than optimal and
    # never unsafely short
    ranked = ex.join(freq, "__h").withColumn(
        "__rk", F.row_number().over(W.partitionBy("__id").orderBy("__f", "__h"))
    )
    prefix = ranked.filter(
        F.col("__rk") <= F.col("__n") - F.floor(F.lit(threshold) * F.col("__n")) + 1
    )
    a = ex.select(F.col("__id").alias("id_a"), F.col("__n").alias("__na"), "__h")
    b = prefix.select(F.col("__id").alias("id_b"), F.col("__n").alias("__nb"), "__h")
    # size-ratio prune inside the join condition (see minhash_lsh_pairs for
    # the float-safety argument); the full⋈prefix join sees each true pair
    # from both directions, so normalize before the distinct
    ratio = F.least("__na", "__nb").cast("double") / F.greatest("__na", "__nb") >= F.lit(threshold)
    cands = (
        a.join(b, "__h")
        .filter((F.col("id_a") != F.col("id_b")) & ratio)
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .distinct()
    )
    return _verify_jaccard(cands, sets, threshold)


def _jaccard_dense(
    ex: DataFrame, freq: DataFrame, threshold: float, n_blocks: int = 8
) -> DataFrame:
    """All-pairs exact Jaccard via a distributed 0/1 block matmul (small-vocab
    regime). Same block-nested-loop shape as
    ``similarity.embedding_near_dup_pairs``: rows replicate to their
    unordered block pairs through ONE shuffle; each of the
    n_blocks·(n_blocks+1)/2 pair-groups multiplies its two doc×vocab 0/1
    matrices in one task (intersection counts < 2²⁴ are exact in float32).
    Nothing collects to the driver and nothing broadcasts except the tiny
    vocab; the result is independent of ``n_blocks``. Shingles with f = 1
    are dropped from the vocab (they intersect nothing); true set sizes
    ``__n`` still drive the union term.
    """
    import numpy as np

    B = int(n_blocks)
    vocab = freq.select("__h").withColumn(
        "__ix", F.row_number().over(W.orderBy("__h")) - 1
    )
    docs = (
        ex.join(F.broadcast(vocab), "__h")
        .groupBy("__id", "__n")
        .agg(F.collect_list("__ix").alias("__ixs"))
    )
    rep = (
        docs.withColumn("__blk", F.pmod(F.xxhash64(F.col("__id")), F.lit(B)))
        .withColumn("__j", F.explode(F.sequence(F.lit(0), F.lit(B - 1))))
        .withColumn("__ba", F.least("__blk", "__j"))
        .withColumn("__bb", F.greatest("__blk", "__j"))
        .drop("__j")
    )

    def pair_block(key, pdf):
        ba, bb = int(key[0]), int(key[1])
        # per-group matrix width: indexes absent from the group contribute 0
        # to every intersection, so clipping the width to the group's max
        # index changes nothing and bounds memory
        width = 1 + int(max((max(x) for x in pdf["__ixs"] if len(x)), default=0))

        def to_mat(sub):
            ids = sub["__id"].to_numpy(np.int64)
            ns = sub["__n"].to_numpy(np.int64)
            m = np.zeros((len(ids), width), np.float32)
            for i, ixs in enumerate(sub["__ixs"]):
                m[i, np.asarray(ixs, np.int64)] = 1.0
            return ids, ns, m

        empty = pd.DataFrame({"id_a": [], "id_b": [], "__j": []}).astype(
            {"id_a": np.int64, "id_b": np.int64, "__j": np.float64}
        )
        if ba == bb:
            ids, ns, m = to_mat(pdf)
            c = (m @ m.T).astype(np.float64)  # exact: counts < 2^24
            jac = c / (ns[:, None] + ns[None, :] - c)
            li, ri = np.nonzero((jac >= threshold) & (ids[:, None] < ids[None, :]))
            return pd.DataFrame({"id_a": ids[li], "id_b": ids[ri], "__j": jac[li, ri]})
        a_sub, b_sub = pdf[pdf["__blk"] == ba], pdf[pdf["__blk"] == bb]
        if a_sub.empty or b_sub.empty:  # one block of the pair may be empty
            return empty
        a_ids, a_ns, a_m = to_mat(a_sub)
        b_ids, b_ns, b_m = to_mat(b_sub)
        c = (a_m @ b_m.T).astype(np.float64)
        jac = c / (a_ns[:, None] + b_ns[None, :] - c)
        li, ri = np.nonzero(jac >= threshold)
        ia, ib = a_ids[li], b_ids[ri]
        return pd.DataFrame(
            {"id_a": np.minimum(ia, ib), "id_b": np.maximum(ia, ib), "__j": jac[li, ri]}
        )

    out = rep.groupBy("__ba", "__bb").applyInPandas(
        pair_block, schema="id_a long, id_b long, __j double"
    )
    return out.select("id_a", "id_b", F.round("__j", 6).alias("jaccard"))


def derive_banding(num_hashes: int, threshold: float, max_miss: float = 1e-6) -> int:
    """Pick bands for an LSH banding scheme from the requested threshold.

    Returns the band count b (rows per band r = num_hashes // b) with the
    LARGEST r — fewest sub-threshold candidate collisions — whose
    false-negative probability at jaccard = threshold, (1 − τ^r)^b, stays
    under ``max_miss``. Precision and recall trade off through r: r=4 at
    τ=0.8 gives P[miss] ≈ 5e-8, but at τ=0.6 it would miss ~1.2% of true
    pairs — which is why banding must follow the threshold rather than sit
    at a fixed default (a τ=0.6 caller silently lost recall before this).
    """
    for r in (8, 4, 2, 1):
        if num_hashes % r:
            continue
        b = num_hashes // r
        if (1.0 - threshold**r) ** b <= max_miss:
            return b
    # r=1 fallback is best-effort, not exact: P[miss] = (1-τ)^num_hashes > 0
    # (e.g. 1.4e-6 at τ=0.1 with 128 hashes — can exceed max_miss); no finer
    # banding exists, so warn rather than fail
    import warnings

    warnings.warn(
        f"derive_banding: even r=1 cannot meet max_miss={max_miss} at "
        f"threshold={threshold}; P[miss]={(1.0 - threshold) ** num_hashes:.2e}"
    )
    return num_hashes


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    num_hashes: int = 128,
    bands: int | None = None,
    threshold: float = 0.8,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs, exact-verified.

    Permutations are affine maps h_i(x) = ((2i+1)·x + i²+17) mod 2^31-1 over
    xxhash64 shingle hashes (candidates are exact-verified, so the hash needs
    no SQL-oracle twin); band signature folds its rows into one long join key.
    ``bands=None`` derives the banding from the threshold via
    :func:`derive_banding` (τ=0.8 → 32×4, τ=0.6 → 64×2), keeping
    P[missing a true pair] ≤ 1e-6 while maximizing rows-per-band — the
    precision knob: at r=2 a j=0.3 pair still collides with ~95% probability,
    flooding the candidate join with sub-threshold pairs (measured 173k
    candidates for 256 true pairs on the 5k-doc test corpus); r=4 drops that
    pair's collision odds to ~23%. Every candidate is verified exactly, so
    output = exact pairs at any banding. At corpus scale the candidate
    count — not the signature build — decides feasibility.

    Signature stage: shingle hashing stays JVM-side (``xxhash64`` per
    shingle); the permutation-minima + band folds are ONE vectorized numpy
    kernel over the whole Arrow batch — all docs' shingle sets concatenate
    into a flat vector, the (num_hashes × total) affine map evaluates as one
    matrix op, and per-doc minima come from ``np.minimum.reduceat`` over the
    segment starts. No per-document Python dispatch (a per-doc loop was the
    top entry of the round-1 bench), and the flat vector is tiled so the
    kernel's working set stays bounded regardless of batch shape.
    Signatures shuffle only at the (band, sig) candidate join, whose keys
    are uniform by construction; band-fold collisions only add candidates,
    which exact verification removes.
    """
    if bands is None:
        bands = derive_banding(num_hashes, threshold)
    # reused by the signature build and both sides of the verify join
    sets = _shingle_sets(df, id_col, text_col, n).persist()
    # persisted: both sides of the candidate self-join read it — without the
    # persist the signature pandas UDF would run once per side
    band_sig = _band_index(sets, num_hashes, bands).persist()
    a = band_sig.select(F.col("__id").alias("id_a"), F.col("__n").alias("__na"), "__band", "__sig")
    b = band_sig.select(F.col("__id").alias("id_b"), F.col("__n").alias("__nb"), "__band", "__sig")
    # size-ratio prune: J = c/(na+nb-c) ≤ min(na,nb)/max(na,nb), so any true
    # pair at threshold τ has set sizes within ratio τ. Carrying one extra
    # long per band row costs nothing; on template-heavy corpora (dense LSH
    # buckets full of moderately-similar docs) it drops ~2/3 of candidates
    # BEFORE the distinct shuffle and the array-carrying verify join. The
    # division form is float-safe: correctly-rounded division is monotone, so
    # (min/max)ᵈᵇˡ ≥ Jᵈᵇˡ whenever the real inequality holds — no true pair
    # at the double compare `jaccard >= τ` can be dropped.
    ratio = F.least("__na", "__nb").cast("double") / F.greatest("__na", "__nb") >= F.lit(threshold)
    cands = (
        a.join(b, ["__band", "__sig"])
        .filter((F.col("id_a") < F.col("id_b")) & ratio)
        .select("id_a", "id_b")
        .distinct()
    )
    return _verify_jaccard(cands, sets, threshold)


def _band_index(sets: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(__id, __n, __band, __sig) LSH band index of a ``_shingle_sets`` frame
    — the tiled vectorized signature kernel shared by the self-join dedup
    (:func:`minhash_lsh_pairs`) and the corpus-vs-delta probe
    (:func:`incremental_near_dups`). The returned frame is plain columns, so
    a production pipeline can persist it to parquet and maintain it
    incrementally instead of re-signing the corpus per run."""
    import numpy as np

    rows_per_band = num_hashes // bands
    hs = F.transform("__sh", lambda s: F.pmod(s, F.lit(P31)))
    doc = sets.select("__id", hs.alias("__hs"))
    coef_a = 2 * np.arange(num_hashes, dtype=np.int64)[:, None] + 1
    coef_b = (np.arange(num_hashes, dtype=np.int64) ** 2 + 17)[:, None]
    # tile budget: num_hashes × TILE int64s ≈ 128 × 8192 × 8 = 8 MB — sized to
    # keep the (coef·seg)%P temporaries LLC-resident. The previous 256 MB tile
    # streamed ~800 MB of temporaries per batch through DRAM, which was both
    # ~2× slower and the root cause of the two-round-old bench variance: a
    # memory-bandwidth-bound kernel is exposed to host-level interference
    # (measured standalone: identical input 1.2–6.6 s at 256 MB tiles,
    # 0.68–0.80 s at 8 MB; wall == process-CPU, zero cgroup throttling — see
    # tools/minhash_probe.py). A doc whose shingle set exceeds the tile still
    # processes in one oversized segment — graceful degradation, no cap.
    tile_cells = 8_192

    @F.pandas_udf("array<long>")
    def band_sigs(hss: pd.Series) -> pd.Series:
        sizes = np.fromiter((len(a) if a is not None else 0 for a in hss), np.int64, len(hss))
        nonempty = np.nonzero(sizes)[0]
        out = [None] * len(hss)
        if nonempty.size == 0:
            return pd.Series(out)
        flat = np.concatenate([np.asarray(hss.iloc[i], np.int64) for i in nonempty])
        starts = np.zeros(nonempty.size, np.int64)
        np.cumsum(sizes[nonempty][:-1], out=starts[1:])
        # per-doc minima across docs at once; tile boundaries fall on doc
        # starts so each reduceat segment is contained in one tile
        mins = np.empty((num_hashes, nonempty.size), np.int64)
        lo = 0
        while lo < nonempty.size:
            hi = lo
            end = starts[lo] + tile_cells
            while hi < nonempty.size and (
                hi == lo or starts[hi] + sizes[nonempty[hi]] <= end
            ):
                hi += 1
            seg = flat[starts[lo] : starts[hi] if hi < nonempty.size else flat.size]
            # (2i+1)·h + i²+17 stays < 2^39 — exact in int64
            vals = (coef_a * seg[None, :] + coef_b) % P31
            mins[:, lo:hi] = np.minimum.reduceat(vals, starts[lo:hi] - starts[lo], axis=1)
            lo = hi
        acc = np.zeros((bands, nonempty.size), np.int64)
        for j in range(rows_per_band):
            acc = (acc * 37 + mins[j::rows_per_band][:bands]) % P31
        for k, i in enumerate(nonempty):
            out[i] = acc[:, k]
        return pd.Series(out)

    return doc.select(
        "__id",
        F.array_size("__hs").alias("__n"),
        F.posexplode(band_sigs("__hs")).alias("__band", "__sig"),
    )


def incremental_near_dups(
    corpus: DataFrame,
    delta: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    num_hashes: int = 128,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicates of a DELTA batch against an existing CORPUS — the
    production shape of dedup at 100 TB: the corpus is signed once into a
    band index (:func:`_band_index` — in a real pipeline that index and the
    shingle sets live on parquet, maintained incrementally) and only the
    delta's bands PROBE it; the corpus is never self-joined, so per-run cost
    is O(delta + matched bands), not O(corpus²).

    A delta doc pairs with (a) any corpus doc and (b) any SMALLER-id delta
    doc (so within-batch duplicates resolve deterministically without a
    second pass). Same banding-derived completeness and exact verification
    as :func:`minhash_lsh_pairs`: output is exactly the J ≥ τ pairs.
    Returns (delta_id, dup_of, jaccard).
    """
    bands = derive_banding(num_hashes, threshold)
    c_sets = _shingle_sets(corpus, id_col, text_col, n).persist()
    d_sets = _shingle_sets(delta, id_col, text_col, n).persist()
    c_idx = _band_index(c_sets, num_hashes, bands)
    d_idx = _band_index(d_sets, num_hashes, bands).persist()

    probe = d_idx.select(
        F.col("__id").alias("id_b"), F.col("__n").alias("__nb"), "__band", "__sig"
    )
    base = c_idx.select(
        F.col("__id").alias("id_a"), F.col("__n").alias("__na"), "__band", "__sig"
    )
    earlier = d_idx.select(
        F.col("__id").alias("id_a"), F.col("__n").alias("__na"), "__band", "__sig"
    )
    ratio = F.least("__na", "__nb").cast("double") / F.greatest("__na", "__nb") >= F.lit(threshold)
    cands = (
        base.join(probe, ["__band", "__sig"])
        .filter(ratio)
        .unionByName(
            earlier.join(probe, ["__band", "__sig"])
            .filter((F.col("id_a") < F.col("id_b")) & ratio)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    sets = c_sets.unionByName(d_sets)
    return _verify_jaccard(cands, sets, threshold).select(
        F.col("id_b").alias("delta_id"), F.col("id_a").alias("dup_of"), "jaccard"
    )


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """62-bit SimHash fingerprint per document: for each bit, majority vote of
    token-hash bits (with multiplicity); bit set iff strictly more ones.

    One row per token occurrence, ONE groupBy with 62 conditional sums — no
    per-bit explode (the earlier formulation pushed a 62× row blowup through
    the shuffle; here the map-side combine reduces each doc to 62 partial
    longs regardless of token count). The fingerprint reassembles JVM-side as
    Σ (vote_b > 0) << b — whole-stage codegen, no Python.

    Token hashes come from a **dictionary join**: the per-character polynomial
    fold (kept SQL-expressible for the oracle) is evaluated once per DISTINCT
    token, not once per occurrence — natural corpora repeat tokens thousands
    of times, so this removes ~99% of the hash work; AQE turns the dictionary
    join into a broadcast at runtime when the vocabulary is small.
    """
    toks = df.select(F.col(id_col).alias("__id"), F.explode(tokenize(text_col)).alias("__t"))
    vocab = toks.select("__t").distinct().withColumn("__h", token_hash62(F.col("__t")))
    hashed = toks.join(vocab, "__t").select("__id", "__h")
    votes = [
        F.sum(
            F.when(F.expr(f"(shiftright(__h, {b}) & 1) = 1"), F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"__v{b}")
        for b in range(62)
    ]
    per_doc = hashed.groupBy("__id").agg(*votes)
    fp = F.lit(0).cast("long")
    for b in range(62):
        fp = fp + F.when(F.col(f"__v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return per_doc.select(F.col("__id").alias(id_col), fp.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-duplicate pairs: Hamming distance ≤ max_hamming.

    Candidates via 4 × 16-bit chunk equality (pigeonhole: ≤3 differing bits
    leave ≥1 of 4 chunks identical), then exact bit_count(xor) verification.
    """
    sh = simhash(df, id_col, text_col).persist()  # self-joined below
    chunks = sh.select(
        F.col(id_col).alias("__id"),
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("__c"),
    ).withColumn("__chunk", F.expr("shiftright(simhash, __c * 16) & 65535"))
    a = chunks.select(F.col("__id").alias("id_a"), F.col("simhash").alias("__sh_a"), "__c", "__chunk")
    b = chunks.select(F.col("__id").alias("id_b"), F.col("simhash").alias("__sh_b"), "__c", "__chunk")
    return (
        a.join(b, ["__c", "__chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__sh_a", "__sh_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("__sh_a").bitwiseXOR(F.col("__sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def duplicate_passage_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 5,
) -> DataFrame:
    """Cross-document duplicated-passage detection at k-token resolution —
    the distributed counterpart of suffix-array ExactSubstr dedup (Lee et
    al., "Deduplicating Training Data Makes Language Models Better", ACL'22
    §3.1): a passage duplicated across documents shows up as a run of
    consecutive k-shingle positions whose shingles each occur in more than
    one document, and a run of length r marks an exact shared substring of
    r+k-1 tokens.

    Plan (three shuffles, all on uniform keys, no suffix array and no
    driver state):
    1. positional shingles: narrow projection + bounded explode (one row
       per token position);
    2. shared-shingle set: map-side-combinable count of DISTINCT doc ids
       per shingle, kept where > 1 — shuffles shingle keys once;
    3. membership: semi-join positions against shared shingles (same
       shingle-keyed exchange), then one per-document window to fold
       consecutive positions into runs (pos - row_number() grouping).

    Returns (id, n_dup_positions, n_dup_runs, max_dup_span_tokens) for
    documents containing at least one shared shingle.
    """
    from pyspark.sql import Window as W

    from milan_spark.operators.text import word_ngrams

    grams = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(word_ngrams(text_col, k)).alias("__pos", "__gram"),
    )
    # "appears in >1 distinct doc" as min(id) != max(id): min/max partials
    # are two longs per gram through the map-side combine, where a
    # count_distinct partial carries the whole per-gram id SET into the
    # exchange (measured 20% slower warm, 3x slower cold at sf0.1)
    shared = (
        grams.groupBy("__gram")
        .agg(F.min("__id").alias("__mn"), F.max("__id").alias("__mx"))
        .filter(F.col("__mn") != F.col("__mx"))
        .select("__gram")
    )
    dup = grams.join(shared, "__gram", "left_semi")
    w = W.partitionBy("__id").orderBy("__pos")
    runs = dup.withColumn("__grp", F.col("__pos") - F.row_number().over(w))
    run_sizes = runs.groupBy("__id", "__grp").agg(F.count(F.lit(1)).alias("__run"))
    return run_sizes.groupBy("__id").agg(
        F.sum("__run").alias("n_dup_positions"),
        F.count(F.lit(1)).alias("n_dup_runs"),
        (F.max("__run") + F.lit(k - 1)).alias("max_dup_span_tokens"),
    ).withColumnRenamed("__id", id_col)
