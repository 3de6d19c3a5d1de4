"""Shape/semantics tests for the multimodal binary plumbing."""

from __future__ import annotations

import numpy as np
import pytest

from ast_data_pipeline_spark.operators.multimodal import (
    decode_image,
    extract_features,
    with_multimodal_columns,
)
from ast_data_pipeline_spark.sources.catalog import load


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG", "png")


def test_feature_extraction_shapes(spark, sf_dir):
    docs = with_multimodal_columns(load(spark, sf_dir, "documents"))
    feats = extract_features(docs).toPandas()
    n_docs = load(spark, sf_dir, "documents").count()
    assert len(feats) == n_docs
    assert set(feats["format"]) <= {"png", "jpg", "wav"}
    assert feats["feature_ok"].all()
    # histograms are 8-bin probability vectors
    h = np.stack(feats["histogram8"].to_numpy())
    assert h.shape == (n_docs, 8)
    assert np.allclose(h.sum(axis=1), 1.0, atol=1e-9)
    # payload bytes are ascii text -> mean byte in printable range
    assert (feats["mean_byte"] > 32).all() and (feats["mean_byte"] < 127).all()
    assert (feats["byte_len"] > 0).all()
