"""Approximate algorithms (HLL count-distinct, approximate quantiles).

These are first-class at 100 TB (exact distinct on a hot key is a
shuffle; HLL is a mergeable sketch) but their outputs are
engine-specific, so they get tolerance tests against the exact answers
rather than DuckDB oracles (SURVEY §5: driver records rows-only checks
for non-SQL-expressible ops — here we keep them out of the registry and
pin accuracy in tests instead)."""

from pyspark.sql import functions as F

from aws_pandas_etl_spark.sources.readers import load_table

SF = "/root/testdata/sf0.01"


def test_hll_distinct_within_tolerance(spark):
    ev = load_table(spark, SF, "events")
    exact = ev.select(F.countDistinct("user_id").alias("n")).first()["n"]
    approx = ev.select(
        F.approx_count_distinct("user_id", rsd=0.02).alias("n")
    ).first()["n"]
    assert abs(approx - exact) <= max(3, 0.06 * exact)


def test_hll_distinct_per_key_within_tolerance(spark):
    ev = load_table(spark, SF, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    approx = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(3, 0.06 * n), k


def test_approx_percentile_within_tolerance(spark):
    ev = load_table(spark, SF, "events")
    [p50, p95] = ev.select(
        F.percentile_approx("value", [0.5, 0.95], 10_000).alias("p")
    ).first()["p"]
    exact = ev.approxQuantile("value", [0.5, 0.95], 0.0)  # 0.0 = exact
    assert abs(p50 - exact[0]) <= 0.01 * max(1.0, abs(exact[0]))
    assert abs(p95 - exact[1]) <= 0.01 * max(1.0, abs(exact[1]))


def test_ann_recall_vs_bruteforce(spark):
    """Recall@10 of the two ANN paths against exact brute force,
    averaged over 20 held-out query vectors drawn from the corpus
    (excluded from their own result sets).  Floors are the measured
    sf0.01 numbers minus slack; the point is a tripwire for a probe /
    bucketing regression silently nuking recall while row counts stay
    plausible.  Measured values are recorded in BASELINE.md §ANN."""
    from aws_pandas_etl_spark.operators import similarity as SIM
    from aws_pandas_etl_spark.operators.clustering import kmeans_fit

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    # fit-once/assign-many: the same fitted quantizer every IVF query
    # shares via the _kmeans_cents artifact (fitting per probe call
    # would re-run Lloyd's 40x for identical centroids)
    cents16 = kmeans_fit(emb, k=16, iters=2)
    queries = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.orderBy("vec_id").limit(20).collect()
    }

    def ids(df, qid):
        return {r["vec_id"] for r in df.collect() if r["vec_id"] != qid}

    k = 10
    recalls = {"lsh": [], "lsh_probe1": [], "lsh_probe2": [], "ivf2": [], "ivf4": []}
    for qid, q in queries.items():
        exact = ids(SIM.topk_bruteforce(emb, q, k=k + 1), qid)
        for name, approx in (
            ("lsh", SIM.topk_lsh(emb, q, k=k + 1, num_planes=4)),
            ("lsh_probe1", SIM.topk_lsh(emb, q, k=k + 1, num_planes=4, hamming_probe=1)),
            ("lsh_probe2", SIM.topk_lsh(emb, q, k=k + 1, num_planes=4, hamming_probe=2)),
            ("ivf2", SIM.topk_ivf(emb, q, k=k + 1, nprobe=2, cents=cents16)),
            ("ivf4", SIM.topk_ivf(emb, q, k=k + 1, nprobe=4, cents=cents16)),
        ):
            got = ids(approx, qid)
            recalls[name].append(len(got & exact) / len(exact))

    means = {n: sum(v) / len(v) for n, v in recalls.items()}
    print("ANN recall@10:", {n: round(m, 3) for n, m in means.items()})
    # the recall knobs must be monotone: more probed buckets/cells
    # never lose recall
    assert means["lsh_probe1"] >= means["lsh"] - 1e-9
    assert means["lsh_probe2"] >= means["lsh_probe1"] - 1e-9
    assert means["ivf4"] >= means["ivf2"] - 1e-9
    # measured floors = sf0.01 measurements minus slack (BASELINE.md §ANN:
    # lsh 0.135, probe1 0.445, probe2 ~0.8; fitted-centroid IVF —
    # kmeans_fit k=16, the _kmeans_cents contract — ivf2 0.695,
    # ivf4 0.825)
    assert means["lsh_probe1"] >= 0.30, means
    assert means["lsh_probe2"] >= 0.60, means
    assert means["ivf2"] >= 0.60, means
    assert means["ivf4"] >= 0.72, means


def test_jl_projection_fidelity_grows_with_dims(spark):
    """JL sanity on the adversarial fixture (near-uniform embeddings
    have almost no distance spread, so projection noise dominates):
    pairwise-distance correlation with the original 64-dim space must
    GROW with output dims and clear a floor at the measured values —
    everything is deterministic (md5 planes + fixed data), so drift
    means a code regression.  Measured: 0.26 @ 8, 0.34 @ 16,
    0.46 @ 32."""
    import numpy as np

    from aws_pandas_etl_spark.operators import similarity as SIM
    from aws_pandas_etl_spark.sources.readers import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    rows = emb.select("vec_id", "embedding").limit(200).collect()
    ids = [r["vec_id"] for r in rows]
    orig = np.array([r["embedding"] for r in rows], dtype=np.float64)
    iu = np.triu_indices(len(ids), k=1)
    d_orig = ((orig[iu[0]] - orig[iu[1]]) ** 2).sum(axis=1)

    def corr_at(p):
        proj_rows = SIM.jl_project(
            emb.filter(F.col("vec_id").isin(ids)), out_dims=p, dims=64
        ).collect()
        pm = {}
        for r in proj_rows:
            pm.setdefault(r["vec_id"], {})[r["dim"]] = r["value"]
        proj = np.array([[pm[i][d] for d in range(p)] for i in ids])
        d_proj = ((proj[iu[0]] - proj[iu[1]]) ** 2).sum(axis=1)
        return float(np.corrcoef(d_orig, d_proj)[0, 1])

    c8, c16, c32 = corr_at(8), corr_at(16), corr_at(32)
    assert c8 < c16 < c32, (c8, c16, c32)
    assert c16 >= 0.25 and c32 >= 0.35, (c16, c32)


def test_knn_graph_recall_vs_exact(spark):
    """Approximate all-kNN (cluster-blocked) vs exact per-vector top-5:
    mean recall@5 on the deterministic fixture, floor pinned under the
    measured value (near-uniform embeddings are the adversarial case;
    drift = code regression).  Also sanity: neighbors are ordered by
    descending cosine and never self-referential."""
    import numpy as np

    from aws_pandas_etl_spark.operators.clustering import knn_graph
    from aws_pandas_etl_spark.sources.readers import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    got_rows = knn_graph(emb, k_neighbors=5, k=8, iters=2, assign_probes=2).collect()
    got = {}
    for r in got_rows:
        assert r["a"] != r["b"]
        got.setdefault(r["a"], []).append(r["b"])
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = np.round(m @ m.T, 6)
    np.fill_diagonal(sims, -2.0)
    recalls = []
    for i, vid in enumerate(ids):
        # exact top-5 with the same (cos DESC, id ASC) tie-break
        order = sorted(range(len(ids)), key=lambda j: (-sims[i, j], ids[j]))[:5]
        exact = {int(ids[j]) for j in order}
        approx = set(got.get(int(vid), []))
        recalls.append(len(exact & approx) / 5.0)
    mean_recall = sum(recalls) / len(recalls)
    # measured on this fixture: 0.711 with k=8, p=2 — floor with slack
    assert mean_recall >= 0.55, mean_recall


def test_register_hll_estimate_accuracy(spark):
    """The registry's register-based HLL (m=64 -> ~13% std error) must
    land within 3 sigma of the exact distinct count per event type —
    a tripwire for a register-routing or rank-extraction regression
    that would still pass structural checks."""
    from aws_pandas_etl_spark.plans.queries import QUERIES

    rows = QUERIES["hll_distinct_users"](spark, SF).collect()
    assert rows, "no event types"
    for r in rows:
        tol = max(5.0, 0.40 * r["exact_distinct"])
        assert abs(r["est_distinct"] - r["exact_distinct"]) <= tol, dict(r.asDict())


def test_kmv_estimate_accuracy(spark):
    """KMV with k=64 has ~12.6% std error; 3-sigma tolerance."""
    from aws_pandas_etl_spark.plans.queries import QUERIES

    rows = QUERIES["approx_distinct_users_kmv"](spark, SF).collect()
    assert rows
    for r in rows:
        tol = max(5.0, 0.40 * r["exact_distinct"])
        assert abs(r["est_distinct"] - r["exact_distinct"]) <= tol, dict(r.asDict())


def test_bootstrap_ci_brackets_mean(spark):
    """The Poisson-bootstrap CI must bracket the full-sample mean and
    be properly ordered (deterministic data + hash-seeded weights, so
    this pins forever once true)."""
    from aws_pandas_etl_spark.plans.queries import QUERIES

    rows = QUERIES["bootstrap_ci_mean_value"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["ci_lo"] < r["ci_hi"], dict(r.asDict())
        assert r["ci_lo"] <= r["mean_value"] <= r["ci_hi"], dict(r.asDict())


def test_cdc_chunks_shift_invariant(spark):
    """THE content-defined-chunking property: prepending tokens to a
    document shifts every token position, but all chunk fingerprints
    after the first boundary re-sync must be preserved.  A fixed-size
    chunker fails this (every chunk shifts); CDC passes by design."""
    from aws_pandas_etl_spark.operators.text import cdc_chunks

    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango "
        "uniform victor whiskey xray yankee zulu one two three four five "
        "six seven eight nine ten eleven twelve thirteen fourteen fifteen"
    )
    df = spark.createDataFrame(
        [(1, base), (2, "inserted prefix tokens here " + base)],
        ["doc_id", "text"],
    )
    fp = cdc_chunks(df, "doc_id", "text", mask=8).collect()
    fps1 = {r["fp"] for r in fp if r["doc_id"] == 1}
    fps2 = {r["fp"] for r in fp if r["doc_id"] == 2}
    shared = fps1 & fps2
    # every base chunk except the head chunk containing the splice
    # point must survive the prefix insertion verbatim
    assert len(shared) >= len(fps1) - 1, (len(shared), len(fps1), len(fps2))
    assert len(shared) >= 1


def test_pq_adc_recall_vs_exact_l2(spark):
    """Recall@10 of PQ asymmetric-distance search against exact
    squared-L2 brute force for the registry's query vector.  PQ with
    ~|corpus|/125 codewords per 16-dim subspace on the near-uniform
    adversarial fixture measures 0.4 at sf0.01 (quantization noise is
    the worst case when all distances are similar) — the floor is a
    tripwire for a codebook/LUT regression silently nuking ranking
    while the row count stays 10."""
    from aws_pandas_etl_spark.plans.queries import PQ_QUERY_VEC, QUERIES

    sf = "/root/testdata/sf0.01"
    got = {
        r["vec_id"] for r in QUERIES["pq_adc_topk"](spark, sf).collect()
    }
    assert len(got) == 10
    emb = load_table(spark, sf, "embeddings").collect()
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in emb}
    q = vecs[PQ_QUERY_VEC]

    def l2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    exact = {
        k
        for _, k in sorted(
            (l2(q, v), k) for k, v in vecs.items() if k != PQ_QUERY_VEC
        )[:10]
    }
    recall = len(got & exact) / 10
    print("PQ ADC recall@10:", recall)
    assert recall >= 0.2, (sorted(got), sorted(exact))
