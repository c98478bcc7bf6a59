"""Multimodal plumbing: schema, batch shapes, decode-stub determinism, and
stage outputs across image/audio/video kinds."""

import numpy as np

from alibi_detect_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_payload,
    extract_features,
    media_stats,
    resize_images,
    sample_frames,
    synth_media,
)

N = 300


def test_synth_media_deterministic(spark):
    a = synth_media(spark, N).toPandas().sort_values("media_id").reset_index(drop=True)
    b = synth_media(spark, N, seed=42).toPandas().sort_values("media_id").reset_index(drop=True)
    assert (a["media_id"] == b["media_id"]).all()
    assert all(bytes(x) == bytes(y) for x, y in zip(a["payload"], b["payload"]))
    assert set(a["kind"]) == {"image", "audio", "video"}


def test_decode_shapes(spark):
    pdf = synth_media(spark, 60).toPandas()
    for _, row in pdf.iterrows():
        arr = decode_payload(bytes(row["payload"]), row["kind"], row["meta"])
        if row["kind"] == "image":
            assert arr.shape == (row["meta"]["height"], row["meta"]["width"], row["meta"]["channels"])
        elif row["kind"] == "audio":
            assert arr.shape == (row["meta"]["n_frames"],)
        else:
            assert arr.ndim == 4


def test_extract_features(spark):
    m = synth_media(spark, N)
    f = extract_features(m).toPandas()
    assert len(f) == N
    assert all(len(e) == FEATURE_DIM for e in f["embedding"])
    assert (f["std_val"] >= 0).all()


def test_resize_and_frames(spark):
    m = synth_media(spark, N)
    r = resize_images(m).toPandas()
    assert (r["width"] == 4).all() and (r["height"] == 4).all()
    assert all(len(bytes(p)) == 4 * 4 * 3 for p in r["payload"])
    fr = sample_frames(m, every=2).toPandas()
    assert (fr["frame_idx"] % 2 == 0).all()
    assert all(len(bytes(p)) == 4 * 4 * 3 for p in fr["frame"])


def test_media_stats(spark):
    s = media_stats(synth_media(spark, N)).toPandas()
    assert set(s["kind"]) == {"image", "audio", "video"}
    assert int(s["n_items"].sum()) == N
    assert (s["min_bytes"] <= s["max_bytes"]).all()


def test_pca_outlier_scores(spark):
    """PCA outlier (od/_pca.py semantics): off-subspace instances score high."""
    import numpy as np
    from pyspark.sql import functions as F
    from alibi_detect_spark.operators.outlier import pca_outlier_scores

    rng = np.random.default_rng(31)
    # data living on a 2-D subspace of 6-D + 5 off-subspace outliers
    base = rng.standard_normal((400, 2)) @ rng.standard_normal((2, 6))
    noise = rng.standard_normal((400, 6)) * 0.01
    x = base + noise
    out_idx = [7, 99, 200, 313, 377]
    x[out_idx] += rng.standard_normal((5, 6)) * 4.0
    pdf = [(int(i), [float(v) for v in row]) for i, row in enumerate(x)]
    df = spark.createDataFrame(pdf, "vec_id long, embedding array<double>")
    ref_pred = F.col("vec_id") % 2 == 0  # even rows as ref (includes outliers: robustly high scores anyway)
    scores = pca_outlier_scores(df, ref_pred, n_components=2).toPandas().sort_values("vec_id")
    s = scores["pca_score"].to_numpy()
    thr = np.percentile(s, 98)
    assert set(out_idx) <= set(np.where(s > thr)[0])


def test_gmm_outlier_scores(spark):
    """GMM outlier (od/_gmm.py semantics): off-cluster instances score high."""
    import numpy as np
    from pyspark.sql import functions as F
    from alibi_detect_spark.operators.outlier import gmm_outlier_scores

    rng = np.random.default_rng(41)
    a = rng.standard_normal((200, 4)) * 0.5 + np.array([4, 0, 0, 0])
    b = rng.standard_normal((200, 4)) * 0.5 - np.array([4, 0, 0, 0])
    x = np.concatenate([a, b])
    out_idx = [50, 250, 399]
    x[out_idx] = rng.standard_normal((3, 4)) * 0.5 + np.array([0, 10, 0, 0])
    pdf = [(int(i), [float(v) for v in row]) for i, row in enumerate(x)]
    df = spark.createDataFrame(pdf, "vec_id long, embedding array<double>")
    scores = gmm_outlier_scores(df, F.col("vec_id") % 2 == 1, n_components=2).toPandas().sort_values("vec_id")
    s = scores["gmm_score"].to_numpy()
    thr = np.percentile(s, 99)
    assert set(out_idx) <= set(np.where(s > thr)[0])


def test_lof_outlier_scores(spark):
    """LOF (od/_lof.py semantics): isolated instances score > 1, cluster ~1."""
    import numpy as np
    from pyspark.sql import functions as F
    from alibi_detect_spark.operators.outlier import lof_outlier_scores

    rng = np.random.default_rng(51)
    x = rng.standard_normal((300, 4))
    out_idx = [10, 150, 299]
    x[out_idx] += np.array([[8.0, 0, 0, 0], [0, 9.0, 0, 0], [0, 0, 10.0, 0]])
    pdf = [(int(i), [float(v) for v in row]) for i, row in enumerate(x)]
    df = spark.createDataFrame(pdf, "vec_id long, embedding array<double>")
    # ref excludes the outliers so neighbourhood stats are clean
    ref_pred = (F.col("vec_id") % 2 == 0) & ~F.col("vec_id").isin(*out_idx)
    got = lof_outlier_scores(df, ref_pred, k=10).toPandas().sort_values("vec_id")
    s = got["lof_score"].to_numpy()
    thr = np.percentile(s, 99)
    assert set(out_idx) <= set(np.where(s > thr)[0])
    assert np.median(s) < 1.3  # inliers near 1


def test_kernel_pca_outlier_scores(spark):
    """Kernel-PCA outlier (od/pytorch/pca.py KernelPCATorch semantics):
    off-manifold instances score high (less captured by top components)."""
    import numpy as np
    from pyspark.sql import functions as F
    from alibi_detect_spark.operators.outlier import kernel_pca_outlier_scores

    rng = np.random.default_rng(71)
    theta = rng.uniform(0, 2 * np.pi, 400)
    x = np.stack([np.cos(theta), np.sin(theta), 0.05 * rng.standard_normal(400), 0.05 * rng.standard_normal(400)], 1)
    out_idx = [20, 200, 380]
    x[out_idx] = rng.standard_normal((3, 4)) * 0.1 + np.array([4.0, 4.0, 0, 0])
    pdf = [(int(i), [float(v) for v in row]) for i, row in enumerate(x)]
    df = spark.createDataFrame(pdf, "vec_id long, embedding array<double>")
    ref_pred = (F.col("vec_id") % 2 == 0) & ~F.col("vec_id").isin(*out_idx)
    got = kernel_pca_outlier_scores(df, ref_pred, n_components=4).toPandas().sort_values("vec_id")
    s = got["kpca_score"].to_numpy()
    thr = np.percentile(s, 99)
    assert set(out_idx) <= set(np.where(s > thr)[0])
