"""Training-data generation over the materialized KG: deterministic
negative sampling for knowledge-graph-embedding (TransE/DistMult-style)
training sets.

For each distinct positive triple (src, rel, dst) the sampler emits
``n_neg`` corrupted-tail negatives drawn near-uniformly from the entity
vocabulary by a *deterministic* hash (md5 of the triple + sample index),
then removes false negatives — corrupted triples that exist as positives —
in the standard "filtered setting" (Bordes et al., TransE).

Scale shape (the part that matters at 10^9 entities):

- The entity vocabulary never gets a GLOBAL dense index (a global
  row_number is a single-partition window — a scale killer). Instead each
  entity hashes into one of ``n_buckets`` vocab buckets and gets a
  within-bucket index via a PARTITION BY bucket window (bounded,
  ~|V|/n_buckets rows per partition).
- Bucket sizes are a ≤``n_buckets``-row table — broadcast; its dense rank
  (a join-count over the same ≤n_buckets-row table — no window at all)
  maps hashes onto NON-EMPTY buckets only, so no sample is lost to an
  empty bucket.
- A sample resolves as (hash → non-empty bucket, hash → index mod bucket
  size) and joins the vocab on the (bucket, index) equi-key — a plain
  shuffle join on a synthetic uniform key, no skew. Sampling is
  bucket-weighted near-uniform over the vocabulary (exactly uniform when
  |V| ≫ n_buckets evens the bucket sizes).
- The filtered-setting subtraction is one left_anti equi-join on
  (src, rel, neg_dst) against the positive set.

Everything is md5/integer arithmetic expressible identically in DuckDB,
so the suite query has an exact value-level oracle twin.

Reference analog: the reference has no KGE training path (it is a RAG
service, backend/services/*); this is part of the "operations a
large-scale training-data pipeline would need" surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _h60(col: F.Column) -> F.Column:
    """Deterministic 60-bit non-negative integer from a string column —
    conv(substring(md5(x),1,15),16,10); DuckDB twin:
    CAST('0x' || substr(md5(x),1,15) AS BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def negative_samples(
    edges: DataFrame, n_neg: int = 2, n_buckets: int = 64
) -> DataFrame:
    """(src, rel, dst, neg_idx, neg_dst) — ``n_neg`` deterministic
    corrupted-tail negatives per distinct positive triple, filtered
    setting (no sampled tail that forms a true positive)."""
    pos = edges.select("src", "rel", "dst").distinct()

    vocab = (
        pos.select(F.col("src").alias("entity"))
        .unionByName(pos.select(F.col("dst").alias("entity")))
        .distinct()
        .withColumn("bk", _h60(F.concat(F.lit("vb:"), F.col("entity"))) % n_buckets)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("bk").orderBy("entity")
    indexed = vocab.withColumn("i", F.row_number().over(w) - 1)
    sizes = indexed.groupBy("bk").agg(F.count("*").alias("bk_n"))
    # dense rank over the ≤n_buckets non-empty buckets as a join-count
    # (bkr = |buckets with smaller bk|) instead of an unpartitioned
    # row_number window — same values, but keeps the engine-wide invariant
    # of ZERO single-partition windows (plans/audit enforces it), and the
    # self-join is over a ≤n_buckets-row broadcast-scale table
    smaller = sizes.select(F.col("bk").alias("bk_lt"))
    ranked = (
        sizes.join(smaller, F.col("bk_lt") < F.col("bk"), "left")
        .groupBy("bk", "bk_n")
        .agg(F.count("bk_lt").alias("bkr"))
    )
    n_nonempty = sizes.agg(F.count("*").alias("n_ne"))

    trip = F.concat_ws("|", "src", "rel", "dst")
    gen = (
        pos.withColumn("neg_idx", F.explode(F.array(*[F.lit(j) for j in range(n_neg)])))
        .crossJoin(F.broadcast(n_nonempty))
        .withColumn(
            "bkr",
            _h60(F.concat(F.lit("nb:"), trip, F.lit("|"), F.col("neg_idx").cast("string")))
            % F.col("n_ne"),
        )
        .withColumn(
            "hi",
            _h60(F.concat(F.lit("ni:"), trip, F.lit("|"), F.col("neg_idx").cast("string"))),
        )
    )
    sampled = (
        gen.join(F.broadcast(ranked), "bkr")
        .withColumn("i", F.col("hi") % F.col("bk_n"))
        .join(indexed.select("bk", "i", F.col("entity").alias("neg_dst")), ["bk", "i"])
        .select("src", "rel", "dst", "neg_idx", "neg_dst")
    )
    false_neg = pos.select("src", "rel", F.col("dst").alias("neg_dst"))
    return sampled.join(false_neg, ["src", "rel", "neg_dst"], "left_anti").select(
        "src", "rel", "dst", "neg_idx", "neg_dst"
    )


# ---------------------------------------------------------------------------
# TransE-style embedding training over the materialized edge table. The
# whole thing is DataFrame expressions: embeddings are a *deterministic
# function of the name* (md5-derived uniform init, the standard
# U(-6/sqrt(d), 6/sqrt(d)) of Bordes et al.), so scoring needs NO embedding
# join at all — each triple row computes its own vectors JVM-side via
# transform/zip_with/aggregate, and only the gradient step materializes an
# embedding table. This keeps the hot scoring path shuffle-free and gives
# the margin loss an exact DuckDB value twin (same md5 arithmetic).
# ---------------------------------------------------------------------------

_TWO60 = float(1 << 60)


def _emb_expr(prefix: str, name: F.Column, dim: int) -> F.Column:
    """array<double> embedding — element i is a deterministic uniform in
    (-6/sqrt(dim), 6/sqrt(dim)) from md5(prefix || name || ':' || i)."""
    scale = 6.0 / (dim ** 0.5)
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            _h60(F.concat(F.lit(prefix), name, F.lit(":"), i.cast("string")))
            / F.lit(_TWO60)
            * 2.0
            - 1.0
        )
        * F.lit(scale),
    )


def init_entity_embeddings(edges: DataFrame, dim: int = 16) -> DataFrame:
    """(entity, emb) — hash-initialized entity vectors for every entity in
    the edge vocabulary."""
    vocab = (
        edges.select(F.col("src").alias("entity"))
        .unionByName(edges.select(F.col("dst").alias("entity")))
        .distinct()
    )
    return vocab.withColumn("emb", _emb_expr("te:", F.col("entity"), dim))


def init_relation_embeddings(edges: DataFrame, dim: int = 16) -> DataFrame:
    """(rel, emb) — hash-initialized relation translation vectors."""
    return (
        edges.select("rel").distinct().withColumn("emb", _emb_expr("tr:", F.col("rel"), dim))
    )


def _l1_score(es: F.Column, rr: F.Column, eo: F.Column) -> F.Column:
    """L1 TransE score ||e_s + r - e_o||_1 as a single JVM expression."""
    diff = F.zip_with(F.zip_with(es, rr, lambda x, y: x + y), eo, lambda x, y: x - y)
    return F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + F.abs(x))


def transe_margin_loss(
    edges: DataFrame, dim: int = 16, n_neg: int = 2, gamma: float = 1.0
) -> DataFrame:
    """Per-relation filtered-setting margin loss at the deterministic
    initialization: for each (positive, corrupted-tail) sample from
    ``negative_samples``, hinge = max(0, gamma + d(s,r,o) - d(s,r,o')),
    aggregated per relation. Returns (rel, n_samples, n_active, avg_loss).

    Scale shape: embeddings are computed inline per row (no embedding
    join); the only shuffles are the negative sampler's bucketed vocab
    join and one final hash-agg on rel."""
    samples = negative_samples(edges, n_neg=n_neg)
    es = _emb_expr("te:", F.col("src"), dim)
    rr = _emb_expr("tr:", F.col("rel"), dim)
    eo = _emb_expr("te:", F.col("dst"), dim)
    en = _emb_expr("te:", F.col("neg_dst"), dim)
    hinge = F.greatest(
        F.lit(0.0), F.lit(gamma) + _l1_score(es, rr, eo) - _l1_score(es, rr, en)
    )
    return (
        samples.withColumn("hinge", hinge)
        .groupBy("rel")
        .agg(
            F.count("*").alias("n_samples"),
            F.sum((F.col("hinge") > 0).cast("bigint")).alias("n_active"),
            F.round(F.avg("hinge"), 6).alias("avg_loss"),
        )
    )


def transe_sgd_step(
    edges: DataFrame,
    dim: int = 16,
    n_neg: int = 2,
    gamma: float = 1.0,
    lr: float = 0.01,
) -> tuple[DataFrame, DataFrame]:
    """One full-batch subgradient step of TransE (L1 score, filtered-setting
    corrupted tails) entirely in DataFrame ops. Returns the updated
    ``(entity, emb)`` and ``(rel, emb)`` tables.

    For an active sample (hinge > 0) with v_pos = e_s + r - e_o and
    v_neg = e_s + r - e_o', the L1 subgradients are sign vectors:

    - e_s  += -lr * (sign(v_pos) - sign(v_neg))
    - r    += -lr * (sign(v_pos) - sign(v_neg))
    - e_o  += -lr * (-sign(v_pos))
    - e_o' += -lr * (+sign(v_neg))

    Scale shape: per-sample sign vectors posexplode to (name, i, g) rows —
    O(samples × dim), the same order as the scoring work — and gradients
    accumulate in one hash-agg keyed by (name, dim index); the updated
    table rebuilds arrays with an array_sort(collect_list(struct)) over the
    per-name dim rows (bounded at ``dim`` elements). No windows, no Python."""
    samples = negative_samples(edges, n_neg=n_neg)
    es = _emb_expr("te:", F.col("src"), dim)
    rr = _emb_expr("tr:", F.col("rel"), dim)
    eo = _emb_expr("te:", F.col("dst"), dim)
    en = _emb_expr("te:", F.col("neg_dst"), dim)
    v_pos = F.zip_with(F.zip_with(es, rr, lambda x, y: x + y), eo, lambda x, y: x - y)
    v_neg = F.zip_with(F.zip_with(es, rr, lambda x, y: x + y), en, lambda x, y: x - y)
    sgn = lambda c: F.when(c > 0, F.lit(1.0)).when(c < 0, F.lit(-1.0)).otherwise(F.lit(0.0))  # noqa: E731

    active = (
        samples.withColumn("sp", F.transform(v_pos, sgn))
        .withColumn("sn", F.transform(v_neg, sgn))
        .withColumn(
            "hinge",
            F.greatest(F.lit(0.0), F.lit(gamma) + _l1_score(es, rr, eo) - _l1_score(es, rr, en)),
        )
        .where(F.col("hinge") > 0)
    )
    dsr = F.zip_with("sp", "sn", lambda a, b: a - b)  # grad for s and rel
    contribs = (
        active.select(F.concat(F.lit("e:"), "src").alias("name"), dsr.alias("g"))
        .unionByName(active.select(F.concat(F.lit("r:"), "rel").alias("name"), dsr.alias("g")))
        .unionByName(
            active.select(
                F.concat(F.lit("e:"), "dst").alias("name"),
                F.transform("sp", lambda x: -x).alias("g"),
            )
        )
        .unionByName(active.select(F.concat(F.lit("e:"), "neg_dst").alias("name"), F.col("sn").alias("g")))
    )
    grads = (
        contribs.select("name", F.posexplode("g").alias("i", "gi"))
        .groupBy("name", "i")
        .agg(F.sum("gi").alias("gi"))
        .groupBy("name")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "gi"))), lambda s: s["gi"]
            ).alias("grad")
        )
    )

    def updated(init: DataFrame, key: str, prefix: str) -> DataFrame:
        # filter to THIS namespace before stripping the prefix: an entity
        # and a relation sharing a surface string ("x" → grads "e:x" and
        # "r:x") must each receive only their own gradient, never both
        ns = grads.where(F.col("name").startswith(prefix))
        joined = init.join(
            ns.withColumn(key, F.expr(f"substring(name, {len(prefix) + 1})")).drop("name"),
            key,
            "left",
        )
        step = F.when(
            F.col("grad").isNull(), F.col("emb")
        ).otherwise(F.zip_with("emb", "grad", lambda e, g: e - F.lit(lr) * g))
        return joined.select(key, step.alias("emb"))

    ents = updated(init_entity_embeddings(edges, dim), "entity", "e:")
    rels = updated(init_relation_embeddings(edges, dim), "rel", "r:")
    return ents, rels


def transe_loss_with(
    edges: DataFrame,
    entity_emb: DataFrame,
    rel_emb: DataFrame,
    n_neg: int = 2,
    gamma: float = 1.0,
) -> DataFrame:
    """Margin loss evaluated against *materialized* embedding tables (the
    post-step evaluation path): joins each sample to its three entity rows
    and one relation row — all equi-joins; the relation table is broadcast-
    scale by construction."""
    samples = negative_samples(edges, n_neg=n_neg)
    e = entity_emb
    scored = (
        samples.join(e.select(F.col("entity").alias("src"), F.col("emb").alias("es")), "src")
        .join(e.select(F.col("entity").alias("dst"), F.col("emb").alias("eo")), "dst")
        .join(e.select(F.col("entity").alias("neg_dst"), F.col("emb").alias("en")), "neg_dst")
        # rename the key: rel_emb may share its `rel` attribute lineage with
        # the sample table (both descend from the same edges scan), and a
        # USING join on an identical expression id trips Catalyst's
        # self-join disambiguation
        .join(
            F.broadcast(
                rel_emb.select(F.col("rel").alias("rel_k"), F.col("emb").alias("rr"))
            ),
            F.col("rel") == F.col("rel_k"),
        )
        .drop("rel_k")
        .withColumn(
            "hinge",
            F.greatest(
                F.lit(0.0),
                F.lit(gamma)
                + _l1_score(F.col("es"), F.col("rr"), F.col("eo"))
                - _l1_score(F.col("es"), F.col("rr"), F.col("en")),
            ),
        )
    )
    return scored.groupBy("rel").agg(
        F.count("*").alias("n_samples"),
        F.sum((F.col("hinge") > 0).cast("bigint")).alias("n_active"),
        F.round(F.avg("hinge"), 6).alias("avg_loss"),
    )


def transe_predict_tails(
    edges: DataFrame,
    dim: int = 16,
    k: int = 3,
    max_candidates: int = 256,
) -> DataFrame:
    """Link prediction: for every observed (src, rel) query, the top-``k``
    NEW tail entities by TransE L1 score (filtered ranking — tails already
    observed for that (src, rel) are excluded), with type-constrained
    candidate generation: candidates for a relation are the entities that
    appear as ITS tails anywhere, capped at the ``max_candidates`` most
    frequent (ties to the smallest id). Returns
    (src, rel, pred_dst, score, rank).

    Scale shape: the query×candidate fan-out is per-relation
    |queries_r| × min(|tails_r|, max_candidates) — bounded by the cap, and
    keyed by rel so it shuffles once on a low-cardinality key with AQE skew
    splitting available; embeddings are inline (no join); ranking windows
    are PARTITION BY (src, rel) / PARTITION BY rel top-k
    (WindowGroupLimit). Scores round to 6 decimals BEFORE ranking so the
    ordering is reproducible across engines."""
    from pyspark.sql import Window

    pos = edges.select("src", "rel", "dst").distinct()
    w_cand = Window.partitionBy("rel").orderBy(F.desc("n"), F.asc("dst"))
    cands = (
        pos.groupBy("rel", "dst")
        .agg(F.count("*").alias("n"))
        .withColumn("rk", F.row_number().over(w_cand))
        .where(F.col("rk") <= max_candidates)
        .select("rel", F.col("dst").alias("pred_dst"))
    )
    queries = pos.select("src", "rel").distinct()
    es = _emb_expr("te:", F.col("src"), dim)
    rr = _emb_expr("tr:", F.col("rel"), dim)
    ec = _emb_expr("te:", F.col("pred_dst"), dim)
    scored = queries.join(cands, "rel").withColumn(
        "score", F.round(_l1_score(es, rr, ec), 6)
    )
    known = pos.select("src", "rel", F.col("dst").alias("pred_dst"))
    fresh = scored.join(known, ["src", "rel", "pred_dst"], "left_anti")
    w_rank = Window.partitionBy("src", "rel").orderBy(F.asc("score"), F.asc("pred_dst"))
    return (
        fresh.withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= k)
        .select("src", "rel", "pred_dst", "score", "rank")
    )


def transe_eval(
    edges: DataFrame,
    dim: int = 16,
    hits_k: int = 3,
    max_candidates: int = 256,
) -> DataFrame:
    """Link-prediction quality of the (deterministic-init) TransE model in
    the standard **filtered ranking** protocol: every distinct positive
    (src, rel, dst) is a test query; its tail is ranked among the
    relation's type-constrained candidate set by L1 score (other true
    tails of the same (src, rel) are ignored when counting rivals — the
    Bordes et al. filtered setting). Returns per-relation
    (rel, n_queries, mrr, hits_at_k).

    rank = 1 + |candidates with strictly better (score, id) that are not
    themselves positives|, computed as one candidate-join + hash-agg — no
    sort of the full candidate list, no window at all: the per-query rank
    is a COUNT, so the plan is join → filter → groupBy. Scores round to 6
    decimals before comparison so both engines agree on "better"."""
    from pyspark.sql import Window

    pos = edges.select("src", "rel", "dst").distinct()
    w_cand = Window.partitionBy("rel").orderBy(F.desc("n"), F.asc("dst"))
    cands = (
        pos.groupBy("rel", "dst")
        .agg(F.count("*").alias("n"))
        .withColumn("rk", F.row_number().over(w_cand))
        .where(F.col("rk") <= max_candidates)
        .select("rel", F.col("dst").alias("cand"))
    )
    es = _emb_expr("te:", F.col("src"), dim)
    rr = _emb_expr("tr:", F.col("rel"), dim)
    true_score = F.round(_l1_score(es, rr, _emb_expr("te:", F.col("dst"), dim)), 6)
    cand_score = F.round(_l1_score(es, rr, _emb_expr("te:", F.col("cand"), dim)), 6)

    scored = (
        pos.withColumn("true_score", true_score)
        .join(cands, "rel")
        .where(F.col("cand") != F.col("dst"))
        .withColumn("cand_score", cand_score)
    )
    # a rival beats the true tail on (score asc, id asc); positives are
    # filtered out of the rival set (left_anti on the positive identity)
    rivals = (
        scored.where(
            (F.col("cand_score") < F.col("true_score"))
            | (
                (F.col("cand_score") == F.col("true_score"))
                & (F.col("cand") < F.col("dst"))
            )
        )
        .join(
            pos.select("src", "rel", F.col("dst").alias("cand")),
            ["src", "rel", "cand"],
            "left_anti",
        )
        .groupBy("src", "rel", "dst")
        .agg(F.count("*").alias("n_better"))
    )
    ranked = pos.join(rivals, ["src", "rel", "dst"], "left").select(
        "src", "rel", "dst",
        (F.coalesce(F.col("n_better"), F.lit(0)) + 1).alias("rank"),
    )
    return ranked.groupBy("rel").agg(
        F.count("*").alias("n_queries"),
        F.round(F.avg(1.0 / F.col("rank")), 6).alias("mrr"),
        F.round(
            F.avg((F.col("rank") <= hits_k).cast("double")), 6
        ).alias("hits_at_k"),
    )


def _dot3(a: F.Column, b: F.Column, c: F.Column) -> F.Column:
    """DistMult trilinear score sum_i a_i * b_i * c_i as one JVM
    expression (index-order left fold — matches DuckDB's list_sum over
    the same index order, so the twin is bit-compatible before the
    6-decimal rounding)."""
    prod = F.zip_with(F.zip_with(a, b, lambda x, y: x * y), c, lambda x, y: x * y)
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def distmult_margin_loss(
    edges: DataFrame, dim: int = 16, n_neg: int = 2, gamma: float = 1.0
) -> DataFrame:
    """Per-relation filtered-setting margin loss for a DistMult scorer
    (Yang et al. 2015: s(h, r, t) = <e_h, w_r, e_t>, HIGHER is better —
    hinge = max(0, gamma - s_pos + s_neg)) at the deterministic hash
    initialization. Demonstrates the KGE layer is scorer-pluggable: the
    sampler, inline-embedding trick, and shuffle shape are shared with
    TransE; only the scoring expression differs. Distinct init prefixes
    ("de:"/"dr:") keep the model's parameter space separate from TransE's.

    Scale shape: identical to transe_margin_loss — embeddings computed
    inline per row (no embedding join), one bucketed sampler join, one
    final hash-agg on rel."""
    samples = negative_samples(edges, n_neg=n_neg)
    es = _emb_expr("de:", F.col("src"), dim)
    rr = _emb_expr("dr:", F.col("rel"), dim)
    eo = _emb_expr("de:", F.col("dst"), dim)
    en = _emb_expr("de:", F.col("neg_dst"), dim)
    hinge = F.greatest(
        F.lit(0.0), F.lit(gamma) - _dot3(es, rr, eo) + _dot3(es, rr, en)
    )
    return (
        samples.withColumn("hinge", hinge)
        .groupBy("rel")
        .agg(
            F.count("*").alias("n_samples"),
            F.sum((F.col("hinge") > 0).cast("bigint")).alias("n_active"),
            F.round(F.avg("hinge"), 6).alias("avg_loss"),
        )
    )


def _complex_score(
    hr: F.Column, hi: F.Column, rr: F.Column, ri: F.Column, tr: F.Column, ti: F.Column
) -> F.Column:
    """ComplEx trilinear score Re(<e_h, w_r, conj(e_t)>) (Trouillon et al.
    2016, eq. 11) expanded over the real/imag component arrays:
    Σ_i Re(h)Re(r)Re(t) + Re(h)Im(r)Im(t) + Im(h)Re(r)Im(t)
        − Im(h)Im(r)Re(t).
    Four index-order left folds — same fold order as the DuckDB twin, so
    the double result is bit-compatible before the 6-decimal rounding."""
    return (
        _dot3(hr, rr, tr) + _dot3(hr, ri, ti) + _dot3(hi, rr, ti) - _dot3(hi, ri, tr)
    )


def complex_margin_loss(
    edges: DataFrame, dim: int = 16, n_neg: int = 2, gamma: float = 1.0
) -> DataFrame:
    """Per-relation filtered-setting margin loss for a **ComplEx** scorer
    (Trouillon et al., ICML 2016) at the deterministic hash init — the
    third scorer on the shared KGE substrate (TransE L1, DistMult, now
    ComplEx), proving the layer handles asymmetric relations: unlike
    DistMult, ComplEx's score is NOT symmetric in (h, t), because the
    conjugation flips the sign of the Im(h)Im(r)Re(t) term.

    Embeddings are complex vectors carried as two real arrays with
    distinct init prefixes ("cer:"/"cei:" entity re/im, "crr:"/"cri:"
    relation re/im), computed inline per row exactly like the TransE /
    DistMult paths — no embedding join, one bucketed sampler join
    (negative_samples), one final hash-agg on rel. HIGHER score is
    better; hinge = max(0, gamma - s_pos + s_neg)."""
    samples = negative_samples(edges, n_neg=n_neg)
    hr = _emb_expr("cer:", F.col("src"), dim)
    hi = _emb_expr("cei:", F.col("src"), dim)
    rr = _emb_expr("crr:", F.col("rel"), dim)
    ri = _emb_expr("cri:", F.col("rel"), dim)
    tr = _emb_expr("cer:", F.col("dst"), dim)
    ti = _emb_expr("cei:", F.col("dst"), dim)
    nr = _emb_expr("cer:", F.col("neg_dst"), dim)
    ni = _emb_expr("cei:", F.col("neg_dst"), dim)
    hinge = F.greatest(
        F.lit(0.0),
        F.lit(gamma)
        - _complex_score(hr, hi, rr, ri, tr, ti)
        + _complex_score(hr, hi, rr, ri, nr, ni),
    )
    return (
        samples.withColumn("hinge", hinge)
        .groupBy("rel")
        .agg(
            F.count("*").alias("n_samples"),
            F.sum((F.col("hinge") > 0).cast("bigint")).alias("n_active"),
            F.round(F.avg("hinge"), 6).alias("avg_loss"),
        )
    )


_ROT_MOD = 1 << 20


def _rotation_arrays(name: F.Column, dim: int) -> tuple[F.Column, F.Column]:
    """(cos_arr, sin_arr) — a deterministic unit rotation per dimension for
    a relation name, WITHOUT trig: two 20-bit hash draws (a, b) map to the
    rational point on the unit circle via the tan-half-angle
    parameterization c = (a²−b²)/(a²+b²), s = ±2ab/(a²+b²). Every value is
    an integer ratio evaluated in one IEEE division, so the DuckDB twin is
    bit-identical — cos()/sin() across two engines' libm are not, which is
    why RotatE's phases are carried this way here. a ≥ 1 keeps the
    denominator nonzero. The sine carries an independent hash-parity sign
    ("rrs:" draw): with a ≥ 1, b ≥ 0 alone, s would always be ≥ 0 and every
    phase would land in [0, π] — half the circle, with conjugate/inverse
    rotations unrepresentable at init; the sign bit restores the full
    [−π, π] phase space RotatE's inversion-modeling claim rests on."""

    def elem(i: F.Column, kind: str) -> F.Column:
        a = (
            _h60(F.concat(F.lit("rra:"), name, F.lit(":"), i.cast("string")))
            % F.lit(_ROT_MOD)
            + F.lit(1)
        ).cast("double")
        b = (
            _h60(F.concat(F.lit("rrb:"), name, F.lit(":"), i.cast("string")))
            % F.lit(_ROT_MOD)
        ).cast("double")
        denom = a * a + b * b
        if kind == "cos":
            return (a * a - b * b) / denom
        sign = (
            F.lit(1)
            - F.lit(2)
            * (
                _h60(F.concat(F.lit("rrs:"), name, F.lit(":"), i.cast("string")))
                % F.lit(2)
            )
        ).cast("double")
        return sign * (F.lit(2.0) * a * b) / denom

    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    return (
        F.transform(idx, lambda i: elem(i, "cos")),
        F.transform(idx, lambda i: elem(i, "sin")),
    )


def _rotate_dist(
    hr: F.Column, hi: F.Column, c: F.Column, s: F.Column, tr: F.Column, ti: F.Column, dim: int
) -> F.Column:
    """RotatE L1 distance ‖h∘r − t‖₁ over component arrays: per dimension
    |hr·c − hi·s − tr| + |hr·s + hi·c − ti|, summed in index order (one
    fold — matches the DuckDB list_transform/list_sum twin term for
    term)."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        F.lit(0.0),
        # acc + (|re| + |im|): the inner sum is grouped first so the fold
        # associates exactly like the DuckDB twin's list_sum over
        # per-element (|re| + |im|) terms — FP addition is not associative.
        lambda acc, i: acc
        + (
            F.abs(
                F.element_at(hr, i + 1) * F.element_at(c, i + 1)
                - F.element_at(hi, i + 1) * F.element_at(s, i + 1)
                - F.element_at(tr, i + 1)
            )
            + F.abs(
                F.element_at(hr, i + 1) * F.element_at(s, i + 1)
                + F.element_at(hi, i + 1) * F.element_at(c, i + 1)
                - F.element_at(ti, i + 1)
            )
        ),
    )


def rotate_margin_loss(
    edges: DataFrame, dim: int = 16, n_neg: int = 2, gamma: float = 1.0
) -> DataFrame:
    """Per-relation filtered-setting margin loss for a **RotatE** scorer
    (Sun et al., ICLR 2019: t ≈ h ∘ r with |r_i| = 1, i.e. each relation
    is an element-wise rotation in ℂ; distance LOWER is better, hinge =
    max(0, gamma + d_pos − d_neg)) at the deterministic hash init — the
    fourth scorer on the shared KGE substrate (TransE, DistMult, ComplEx,
    RotatE), and the one that models composition + inversion: rotations
    compose by phase addition and invert by conjugation, which
    translation (TransE) gets but symmetric DistMult cannot.

    Entity embeddings are complex vectors as two real arrays (init
    prefixes "rer:"/"rei:"); relation rotations are unit-modulus by
    construction via the trig-free rational parameterization in
    ``_rotation_arrays`` (prefixes "rra:"/"rrb:"), so no normalization
    step is needed. Scale shape identical to the sibling losses: inline
    per-row embeddings (no embedding join), one bucketed sampler join,
    one final hash-agg on rel."""
    samples = negative_samples(edges, n_neg=n_neg)
    hr = _emb_expr("rer:", F.col("src"), dim)
    hi = _emb_expr("rei:", F.col("src"), dim)
    c, s = _rotation_arrays(F.col("rel"), dim)
    tr = _emb_expr("rer:", F.col("dst"), dim)
    ti = _emb_expr("rei:", F.col("dst"), dim)
    nr = _emb_expr("rer:", F.col("neg_dst"), dim)
    ni = _emb_expr("rei:", F.col("neg_dst"), dim)
    hinge = F.greatest(
        F.lit(0.0),
        F.lit(gamma)
        + _rotate_dist(hr, hi, c, s, tr, ti, dim)
        - _rotate_dist(hr, hi, c, s, nr, ni, dim),
    )
    return (
        samples.withColumn("hinge", hinge)
        .groupBy("rel")
        .agg(
            F.count("*").alias("n_samples"),
            F.sum((F.col("hinge") > 0).cast("bigint")).alias("n_active"),
            F.round(F.avg("hinge"), 6).alias("avg_loss"),
        )
    )


def distmult_eval(
    edges: DataFrame,
    dim: int = 16,
    hits_k: int = 3,
    max_candidates: int = 256,
) -> DataFrame:
    """Filtered-ranking link-prediction quality of the deterministic-init
    **DistMult** scorer — the same Bordes-style protocol as
    ``transe_eval`` (every distinct positive is a test query, tail ranked
    among the relation's type-constrained candidates, other true tails
    filtered out of the rival set) with the trilinear score, proving the
    eval harness is scorer-pluggable exactly like the loss layer: HIGHER
    score is better here, so a rival beats the true tail on
    (score DESC, id ASC). Returns per-relation
    (rel, n_queries, mrr, hits_at_k).

    Scale shape: identical to transe_eval — rank is a rival COUNT (one
    candidate join + hash-agg, no window over the full candidate list);
    embeddings inline ("de:"/"dr:" prefixes, the distmult_margin_loss
    parameter space); scores round to 6 decimals before comparison so
    both engines agree on "better"."""
    from pyspark.sql import Window

    pos = edges.select("src", "rel", "dst").distinct()
    w_cand = Window.partitionBy("rel").orderBy(F.desc("n"), F.asc("dst"))
    cands = (
        pos.groupBy("rel", "dst")
        .agg(F.count("*").alias("n"))
        .withColumn("rk", F.row_number().over(w_cand))
        .where(F.col("rk") <= max_candidates)
        .select("rel", F.col("dst").alias("cand"))
    )
    es = _emb_expr("de:", F.col("src"), dim)
    rr = _emb_expr("dr:", F.col("rel"), dim)
    true_score = F.round(_dot3(es, rr, _emb_expr("de:", F.col("dst"), dim)), 6)
    cand_score = F.round(_dot3(es, rr, _emb_expr("de:", F.col("cand"), dim)), 6)

    scored = (
        pos.withColumn("true_score", true_score)
        .join(cands, "rel")
        .where(F.col("cand") != F.col("dst"))
        .withColumn("cand_score", cand_score)
    )
    rivals = (
        scored.where(
            (F.col("cand_score") > F.col("true_score"))
            | (
                (F.col("cand_score") == F.col("true_score"))
                & (F.col("cand") < F.col("dst"))
            )
        )
        .join(
            pos.select("src", "rel", F.col("dst").alias("cand")),
            ["src", "rel", "cand"],
            "left_anti",
        )
        .groupBy("src", "rel", "dst")
        .agg(F.count("*").alias("n_better"))
    )
    ranked = pos.join(rivals, ["src", "rel", "dst"], "left").select(
        "src", "rel", "dst",
        (F.coalesce(F.col("n_better"), F.lit(0)) + 1).alias("rank"),
    )
    return ranked.groupBy("rel").agg(
        F.count("*").alias("n_queries"),
        F.round(F.avg(1.0 / F.col("rank")), 6).alias("mrr"),
        F.round(
            F.avg((F.col("rank") <= hits_k).cast("double")), 6
        ).alias("hits_at_k"),
    )


def complex_eval(
    edges: DataFrame,
    dim: int = 16,
    hits_k: int = 3,
    max_candidates: int = 256,
) -> DataFrame:
    """Filtered-ranking link-prediction quality of the deterministic-init
    **ComplEx** scorer — completes the scorer-pluggable eval trio
    (TransE L1 lower-better, DistMult trilinear higher-better, now the
    complex trilinear real part, which is asymmetric in (h, t)): same
    Bordes-style protocol, rank = rival COUNT, HIGHER is better. Returns
    per-relation (rel, n_queries, mrr, hits_at_k).

    Scale shape: identical to transe_eval/distmult_eval — one candidate
    join + hash-agg, embeddings inline ("cer:"/"cei:"/"crr:"/"cri:", the
    complex_margin_loss parameter space), 6-decimal rounding before
    comparison."""
    from pyspark.sql import Window

    pos = edges.select("src", "rel", "dst").distinct()
    w_cand = Window.partitionBy("rel").orderBy(F.desc("n"), F.asc("dst"))
    cands = (
        pos.groupBy("rel", "dst")
        .agg(F.count("*").alias("n"))
        .withColumn("rk", F.row_number().over(w_cand))
        .where(F.col("rk") <= max_candidates)
        .select("rel", F.col("dst").alias("cand"))
    )
    hr = _emb_expr("cer:", F.col("src"), dim)
    hi = _emb_expr("cei:", F.col("src"), dim)
    rr = _emb_expr("crr:", F.col("rel"), dim)
    ri = _emb_expr("cri:", F.col("rel"), dim)
    true_score = F.round(
        _complex_score(
            hr, hi, rr, ri,
            _emb_expr("cer:", F.col("dst"), dim),
            _emb_expr("cei:", F.col("dst"), dim),
        ),
        6,
    )
    cand_score = F.round(
        _complex_score(
            hr, hi, rr, ri,
            _emb_expr("cer:", F.col("cand"), dim),
            _emb_expr("cei:", F.col("cand"), dim),
        ),
        6,
    )
    scored = (
        pos.withColumn("true_score", true_score)
        .join(cands, "rel")
        .where(F.col("cand") != F.col("dst"))
        .withColumn("cand_score", cand_score)
    )
    rivals = (
        scored.where(
            (F.col("cand_score") > F.col("true_score"))
            | (
                (F.col("cand_score") == F.col("true_score"))
                & (F.col("cand") < F.col("dst"))
            )
        )
        .join(
            pos.select("src", "rel", F.col("dst").alias("cand")),
            ["src", "rel", "cand"],
            "left_anti",
        )
        .groupBy("src", "rel", "dst")
        .agg(F.count("*").alias("n_better"))
    )
    ranked = pos.join(rivals, ["src", "rel", "dst"], "left").select(
        "src", "rel", "dst",
        (F.coalesce(F.col("n_better"), F.lit(0)) + 1).alias("rank"),
    )
    return ranked.groupBy("rel").agg(
        F.count("*").alias("n_queries"),
        F.round(F.avg(1.0 / F.col("rank")), 6).alias("mrr"),
        F.round(
            F.avg((F.col("rank") <= hits_k).cast("double")), 6
        ).alias("hits_at_k"),
    )
