"""Multimodal plumbing tests: schema, actor stage, stubbed decode, layout."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from saber_ray.stages.multimodal import (MediaDecoder, decode_features,
                                         frame_sample, synthesize_media)
from tests.oracle_util import canon, to_pandas


def test_decode_stub_raises_without_fake():
    dec = MediaDecoder()
    with pytest.raises(NotImplementedError):
        dec._decode_one("image/png", b"xx")


def test_decode_features_deterministic(ray_session):
    media = rd.from_arrow(synthesize_media(48))
    a = to_pandas(decode_features(media, deterministic_fake=True))
    b = to_pandas(decode_features(media, deterministic_fake=True))
    a = a.sort_values("media_id").reset_index(drop=True)
    b = b.sort_values("media_id").reset_index(drop=True)
    assert len(a) == 48
    assert (a["payload_bytes"] > 0).all()
    for x, y in zip(a["feature"], b["feature"]):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_frame_sample_layout(ray_session):
    media = rd.from_arrow(synthesize_media(16))
    out = to_pandas(frame_sample(media, every_n=10))
    src = synthesize_media(16).to_pandas()
    expect = int(((src["meta_n_frames"] + 9) // 10).sum())
    assert len(out) == expect
    assert (out["frame_idx"] % 10 == 0).all()
    per = out.groupby("media_id")["frame_idx"].max().reset_index()
    m = per.merge(src[["media_id", "meta_n_frames"]], on="media_id")
    assert (m["frame_idx"] < m["meta_n_frames"]).all()
