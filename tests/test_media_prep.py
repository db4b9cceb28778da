"""media_prep flagship composition vs a serial replica of the synth
spec: per-format kept counts, byte totals and pixel-mean sums must
match exactly (every decode in the oracle uses the same codecs the
stage uses — the CODECS are conformance-tested elsewhere; this pins the
composition: filtering, the kept-set semi-join, resize accounting)."""

import numpy as np
import pandas as pd

from grawler_ray.functions.gif import decode_gif
from grawler_ray.functions.jpeg import decode_jpeg, encode_jpeg
from grawler_ray.functions.png import decode_png, encode_png, resize_box
from grawler_ray.stages.multimodal import synth_gif, synth_pixels

SF = "/root/testdata/sf0.001"


def _serial_media_prep(doc_ids, min_pixels=200, w=16, h=12):
    rows = {}
    for i in doc_ids:
        i = int(i)
        if i % 13 == 0:
            continue  # non-image
        px = synth_pixels(i)
        kind = i % 3
        if kind == 0:
            payload = encode_png(px)
        elif kind == 1:
            payload = encode_jpeg(px[:, :, :3] if px.ndim == 3 else px, quality=90)
        else:
            payload = synth_gif(i)
        if i % 11 == 0:
            payload = payload[: max(8, len(payload) // 2)]  # truncated
        try:
            if kind == 0:
                dec = decode_png(payload)
                fmt = "png"
            elif kind == 1:
                dec = decode_jpeg(payload)
                fmt = "jpeg"
            else:
                # meta decodes only the FIRST frame: a truncated
                # multi-frame GIF with an intact frame 1 still decodes
                dec = decode_gif(payload, max_frames=1)[0]["image"]
                fmt = "gif"
        except ValueError:
            continue  # corrupt -> dropped
        hh, ww = dec.shape[:2]
        if ww * hh < min_pixels:
            continue
        rs = resize_box(dec, w, h)
        if fmt == "png":
            out_payload = encode_png(rs)
        elif fmt == "jpeg":
            out_payload = encode_jpeg(rs, quality=90)
        else:
            from grawler_ray.functions.gif import encode_gif

            out_payload = encode_gif(rs)
        r = rows.setdefault(fmt, {"n": 0, "bi": 0, "bo": 0, "pm": 0})
        r["n"] += 1
        r["bi"] += len(payload)
        r["bo"] += len(out_payload)
        r["pm"] += int(dec.sum(dtype=np.int64)) * 1000 // dec.size
    return rows


def test_media_prep_vs_serial(ray_session):
    import ray.data

    from grawler_ray.stages.multimodal import media_prep

    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    ids = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"]).doc_id
    got = media_prep(docs).to_pandas().set_index("format")
    exp = _serial_media_prep(ids)
    assert set(got.index) == set(exp)
    for fmt, e in exp.items():
        r = got.loc[fmt]
        assert r.n_kept == e["n"], fmt
        assert r.bytes_in == e["bi"], fmt
        assert r.bytes_out == e["bo"], fmt
        assert r.px_mean_milli_sum == e["pm"], fmt
    # the planted drops actually dropped something
    n_total = len(ids)
    assert got.n_kept.sum() < n_total
