"""Multimodal plumbing tests: schema, actor signature, fan-out, stub gate."""

import numpy as np
import pytest
import ray.data as rd

from knowledgeextraction_ray.stages.multimodal import (DecodeImage,
                                                       decode_images,
                                                       make_fake_media,
                                                       sample_frames)


def test_decode_stub_raises_without_fake():
    dec = DecodeImage(fake=False)
    with pytest.raises(NotImplementedError):
        dec._decode_one(b"xx", 4, 4)


def test_decode_images_pipeline_fake():
    media = make_fake_media(20, "image")
    ds = rd.from_arrow(media)
    out = decode_images(ds, fake=True).to_pandas()
    assert len(out) == 20
    assert set(out.columns) == {"media_id", "pixel_mean", "thumbnail"}
    assert all(len(t) == 64 for t in out["thumbnail"])
    # deterministic: same payload → same decode
    out2 = decode_images(rd.from_arrow(media), fake=True).to_pandas()
    a = out.sort_values("media_id")["pixel_mean"].values
    b = out2.sort_values("media_id")["pixel_mean"].values
    assert np.array_equal(a, b)


def test_sample_frames_fanout():
    media = make_fake_media(5, "video")
    out = sample_frames(rd.from_arrow(media), every_k=4).to_pandas()
    n_frames = dict(zip(media["media_id"].to_pylist(),
                        media["meta_n_frames"].to_pylist()))
    counts = out.groupby("media_id").size().to_dict()
    for mid, n in n_frames.items():
        assert counts[mid] == len(range(0, n, 4))
    assert (out["frame_index"] % 4 == 0).all()


def test_audio_features_pipeline_fake():
    from knowledgeextraction_ray.stages.multimodal import AudioFeatures
    media = make_fake_media(10, "audio")
    ds = rd.from_arrow(media)
    out = ds.map_batches(AudioFeatures, fn_constructor_kwargs={"fake": True},
                         batch_format="pyarrow", batch_size=4,
                         concurrency=(1, 2)).to_pandas()
    assert len(out) == 10
    assert all(len(f) == 16 for f in out["frame_energy"])
    with pytest.raises(NotImplementedError):
        AudioFeatures(fake=False)._decode_one(b"x", 16000)
