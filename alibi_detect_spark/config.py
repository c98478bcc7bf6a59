"""Declarative job configs — the engine's analog of alibi-detect's
config-driven detector save/load (``alibi_detect/saving/saving.py:35``
``save_detector``, ``saving/loading.py:77`` ``load_detector``, registry in
``saving/registry.py``; pydantic schemas in ``saving/schemas.py``).

A config is a JSON-serializable dict: ``{"kind": <registry name>,
"params": {...}}``. ``build(spec)`` resolves the kind against the operator
registry, validates params against the operator's signature (unknown keys
rejected — the schema check), and returns a callable ``(spark, df) →
DataFrame``. Round-trips through :func:`save_config`/:func:`load_config`
reproduce the same plan, mirroring the reference's save → load → identical
predictions contract (tested in ``tests/test_config.py``)."""

from __future__ import annotations

import inspect
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame

from .operators import adversarial, ann, classifier, dedup, drift, llr, outlier, sample, textstats
from .operators.detect import (
    cvm_online_over,
    ewma_over,
    fet_online_over,
    lsdd_online_over,
    lsdd_online_stats_over,
    mahalanobis_online_over,
    mahalanobis_online_stats_over,
    mmd_online_stats_over,
    score_rollup,
    seasonal_band_outliers,
    ssa_outlier_hash_over,
    trend_band_outliers,
)
from .operators.gapfill import gapfill
from .operators.rollup import (
    downsample,
    metric_downsample,
    metric_gapfill,
    metric_rollup,
    rollup_tier1,
)

# registry: kind -> (fn, df-positional-arg-name)
REGISTRY: dict[str, Callable] = {
    "rollup_tier1": rollup_tier1,
    "downsample": downsample,
    "gapfill": gapfill,
    "metric_rollup": metric_rollup,
    "metric_downsample": metric_downsample,
    "metric_gapfill": metric_gapfill,
    "score_rollup": score_rollup,
    "ewma_over": ewma_over,
    "fet_online_over": fet_online_over,
    "cvm_online_over": cvm_online_over,
    "lsdd_online_over": lsdd_online_over,
    "mahalanobis_online_over": mahalanobis_online_over,
    "mmd_online_stats_over": mmd_online_stats_over,
    "seasonal_band_outliers": seasonal_band_outliers,
    "trend_band_outliers": trend_band_outliers,
    "classifier_drift_nb": classifier.classifier_drift_nb,
    "classifier_drift_lr": classifier.classifier_drift_lr,
    "spot_the_diff_drift": classifier.spot_the_diff_drift,
    "learned_kernel_drift_hash": drift.learned_kernel_drift_hash,
    "lsdd_perm_test_hash": drift.lsdd_perm_test_hash,
    "preprocess_drift_hashproj": drift.preprocess_drift_hashproj,
    "gmm_outlier_2feat": outlier.gmm_outlier_2feat,
    "pca_outlier_2feat": outlier.pca_outlier_2feat,
    "vae_outlier_2feat": outlier.vae_outlier_2feat,
    "ae_outlier_2feat": outlier.ae_outlier_2feat,
    "aegmm_features": outlier.aegmm_features,
    "kpca_outlier_2land": outlier.kpca_outlier_2land,
    "ocsvm_mean_2feat": outlier.ocsvm_mean_2feat,
    "llr_outlier_2feat": llr.llr_outlier_2feat,
    "adversarial_ae_2feat": adversarial.adversarial_ae_2feat,
    "model_distillation_2feat": adversarial.model_distillation_2feat,
    "spot_the_diff_drift_2d": classifier.spot_the_diff_drift_2d,
    "lsdd_online_stats_over": lsdd_online_stats_over,
    "mahalanobis_online_stats_over": mahalanobis_online_stats_over,
    "ssa_outlier_hash_over": ssa_outlier_hash_over,
    "drift_corrections": drift.drift_corrections,
    "reservoir_sample": sample.reservoir_sample,
    "infer_threshold": outlier.infer_threshold,
    "kmeans_cells": ann.kmeans_cells,
    "embedding_near_pairs": dedup.embedding_near_pairs,
    "mmd_perm_test": drift.mmd_perm_test,
    "mmd_perm_test_hash": drift.mmd_perm_test_hash,
    "context_mmd_drift": drift.context_mmd_drift,
    "regressor_uncertainty_drift": drift.regressor_uncertainty_drift,
    "lsdd_perm_test": drift.lsdd_perm_test,
    "ks_2samp": drift.ks_2samp,
    "cvm_2samp": drift.cvm_2samp,
    "chi2_contingency": drift.chi2_contingency,
    "mmd_2samp": drift.mmd_2samp,
    "fet_2samp": drift.fet_2samp,
    "tabular_drift": drift.tabular_drift,
    "uncertainty_drift": drift.uncertainty_drift,
    "mahalanobis_scores": drift.mahalanobis_scores,
    "exact_dup_groups": dedup.exact_dup_groups,
    "ngram_jaccard_pairs": dedup.ngram_jaccard_pairs,
    "minhash_lsh_pairs": dedup.minhash_lsh_pairs,
    "dedup_clusters": dedup.dedup_clusters,
    "simhash_near_pairs": dedup.simhash_near_pairs,
    "lang_id": textstats.lang_id,
    "quality_score": textstats.quality_score,
    "token_counts": textstats.token_counts,
    "fingerprint": textstats.fingerprint,
    "tokens_from_text": textstats.tokens_from_text,
}
# ann operators take a Column predicate — configured via an expression string
ANN_REGISTRY = {
    "cosine_topk": ann.cosine_topk,
    "cosine_topk_ivf": ann.cosine_topk_ivf,
    "knn_outlier_scores": ann.knn_outlier_scores,
    "knn_ensemble_scores": ann.knn_ensemble_scores,
    "pca_outlier_scores": outlier.pca_outlier_scores,
    "kernel_pca_outlier_scores": outlier.kernel_pca_outlier_scores,
    "gmm_outlier_scores": outlier.gmm_outlier_scores,
    "lof_outlier_scores": outlier.lof_outlier_scores,
    "iforest_outlier_scores": outlier.iforest_outlier_scores,
    "svm_outlier_scores": outlier.svm_outlier_scores,
    "ae_outlier_scores": outlier.ae_outlier_scores,
}


def validate(spec: dict) -> Callable:
    """Resolve + schema-check a config spec (the ``saving/schemas.py`` role:
    unknown kinds and unknown/missing params fail loudly at load time)."""
    if not isinstance(spec, dict) or "kind" not in spec:
        raise ValueError("config spec must be a dict with a 'kind' key")
    kind = spec["kind"]
    params = spec.get("params", {})
    if kind in ANN_REGISTRY:
        fn = ANN_REGISTRY[kind]
        allowed = set(inspect.signature(fn).parameters) - {"emb", "query_pred", "ref_pred"}
        extra = set(params) - allowed - {"predicate"}
        if extra:
            raise ValueError(f"{kind}: unknown params {sorted(extra)}")
        if "predicate" not in params:
            raise ValueError(f"{kind}: requires a 'predicate' SQL expression param")
        return fn
    if kind not in REGISTRY:
        raise ValueError(f"unknown operator kind {kind!r}; known: {sorted(REGISTRY)}")
    fn = REGISTRY[kind]
    sig = inspect.signature(fn)
    names = list(sig.parameters)
    allowed = set(names[1:])  # first param is the input DataFrame
    extra = set(params) - allowed
    if extra:
        raise ValueError(f"{kind}: unknown params {sorted(extra)} (allowed: {sorted(allowed)})")
    missing = {
        n
        for n, p in list(sig.parameters.items())[1:]
        if p.default is inspect.Parameter.empty and n not in params
    }
    if missing:
        raise ValueError(f"{kind}: missing required params {sorted(missing)}")
    return fn


def build(spec: dict) -> Callable[[object, DataFrame], DataFrame]:
    """Config → runnable operator (``load_detector`` analog)."""
    fn = validate(spec)
    kind, params = spec["kind"], dict(spec.get("params", {}))

    def run(spark, df: DataFrame) -> DataFrame:
        from pyspark.sql import functions as F

        if kind in ANN_REGISTRY:
            pred = F.expr(params.pop("predicate"))
            return ANN_REGISTRY[kind](df, pred, **params)
        return fn(df, **params)

    return run


def _toml_value(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, str):
        return json.dumps(v)  # JSON string escaping is valid TOML basic-string
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_toml_value(x) for x in v) + "]"
    raise ValueError(f"unsupported TOML value type {type(v).__name__}")


def _toml_dumps(spec: dict) -> str:
    """Minimal TOML emitter for the config-spec subset (scalars, lists, one
    level of tables) — the on-disk format of the reference's saved detectors
    (``saving/saving.py:35`` writes ``config.toml``)."""
    lines, tables = [], []
    for k, v in sorted(spec.items()):
        if isinstance(v, dict):
            tables.append((k, v))
        else:
            lines.append(f"{k} = {_toml_value(v)}")
    for name, tbl in tables:
        lines.append(f"\n[{name}]")
        for k, v in sorted(tbl.items()):
            if isinstance(v, dict):
                raise ValueError("config specs nest at most one table level")
            lines.append(f"{k} = {_toml_value(v)}")
    return "\n".join(lines) + "\n"


# reference detector class names (saving/schemas.py `name` field) → engine
# operator kinds, for migrating saved reference configs
REF_NAME_MAP = {
    "KSDrift": "ks_2samp",
    "CVMDrift": "cvm_2samp",
    "ChiSquareDrift": "chi2_contingency",
    "FETDrift": "fet_2samp",
    "TabularDrift": "tabular_drift",
    "MMDDrift": "mmd_perm_test_hash",
    "LSDDDrift": "lsdd_perm_test_hash",
    "ContextMMDDrift": "context_mmd_drift",
    "ClassifierDrift": "classifier_drift_nb",
    "SpotTheDiffDrift": "spot_the_diff_drift",
    "LearnedKernelDrift": "learned_kernel_drift_hash",
    "ClassifierUncertaintyDrift": "uncertainty_drift",
    "RegressorUncertaintyDrift": "regressor_uncertainty_drift",
    "MMDDriftOnline": "mmd_online_stats_over",
    "CVMDriftOnline": "cvm_online_over",
    "FETDriftOnline": "fet_online_over",
    "LSDDDriftOnline": "lsdd_online_over",
    "Mahalanobis": "mahalanobis_online_over",
    "SpectralResidual": "score_rollup",
    "OutlierProphet": "trend_band_outliers",
}
# reference-only config keys with no engine counterpart (artefact paths /
# backend selection / significance applied by the caller) — dropped with a
# report rather than failing the migration
_REF_DROPPED_KEYS = {
    "x_ref", "p_val", "backend", "preprocess_fn", "preprocess_at_init",
    "x_ref_preprocessed", "input_shape", "data_type", "meta", "version",
    "config_spec", "version_warning", "device", "kernel", "dataset",
    "dataloader", "optimizer", "learning_rate", "batch_size", "epochs",
    "verbose", "train_kwargs", "update_x_ref", "update_ref", "n_diffs",
    "initial_diffs", "l1_reg", "binarize_preds", "train_size", "n_folds",
    "retrain_from_scratch",
}


def from_reference_toml(cfg: dict) -> tuple[dict, dict]:
    """Translate a parsed reference ``config.toml`` (``saving/loading.py:
    77-118`` layout: top-level ``name`` = detector class + flat kwargs) into
    an engine spec. Returns ``(spec, dropped)`` where ``dropped`` are the
    reference kwargs with no engine counterpart — surfaced so a migrating
    user sees exactly what the engine ignores instead of a silent rewrite."""
    name = cfg.get("name")
    if name not in REF_NAME_MAP:
        raise ValueError(
            f"unknown reference detector {name!r}; migratable: {sorted(REF_NAME_MAP)}"
        )
    kind = REF_NAME_MAP[name]
    fn = ANN_REGISTRY.get(kind) or REGISTRY[kind]
    allowed = set(inspect.signature(fn).parameters)
    params, dropped = {}, {}
    for k, v in cfg.items():
        if k == "name":
            continue
        if k in allowed:
            params[k] = v
        else:
            dropped[k] = v
    # distinguish expected reference-only drops from unknown keys: a typo'd
    # migratable param must not silently vanish into the dropped report
    unknown = sorted(k for k in dropped if k not in _REF_DROPPED_KEYS)
    if unknown:
        import warnings

        warnings.warn(
            f"reference config keys {unknown} are neither migratable params of "
            f"{kind!r} nor known reference-only keys — check for typos",
            stacklevel=2,
        )
    return {"kind": kind, "params": params}, dropped


def save_config(path: str, spec: dict) -> None:
    """``save_detector`` analog: validate, then persist the declarative spec.
    ``.toml`` paths use the reference's on-disk format family
    (``saving/saving.py:35``); anything else is JSON."""
    validate(spec)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        if path.endswith(".toml"):
            f.write(_toml_dumps(spec))
        else:
            json.dump(spec, f, indent=2, sort_keys=True)


def load_config(path: str) -> Callable[[object, DataFrame], DataFrame]:
    """``load_detector`` analog: read, validate, build. ``.toml`` files are
    parsed with stdlib ``tomllib`` and accept BOTH the engine spec layout
    (``kind`` + ``[params]``) and the reference's saved-detector layout
    (``name = "<DetectorClass>"`` + flat kwargs, translated via
    :func:`from_reference_toml` — reference-only kwargs are dropped)."""
    if path.endswith(".toml"):
        import tomllib

        with open(path, "rb") as f:
            spec = tomllib.load(f)
        if "kind" not in spec and "name" in spec:
            spec, _dropped = from_reference_toml(spec)
        # TOML has no tuple type; signatures with tuple defaults get lists —
        # build() passes them through, operators normalize
    else:
        with open(path) as f:
            spec = json.load(f)
    return build(spec)
