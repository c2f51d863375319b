"""Behavior tests for the LLM-pipeline operators: near-dup recall on planted
duplicates, ANN sanity, and the multimodal Arrow/mapInPandas plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fn_rq_report_etl_dev_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_features,
    to_asset_table,
)
from fn_rq_report_etl_dev_spark.operators.similarity import brute_force_topk, signlsh_topk
from fn_rq_report_etl_dev_spark.operators.text_dedup import (
    content_digest_groups,
    lsh_candidate_pairs,
    ngram_jaccard_on_candidates,
    simhash_collision_pairs,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    near = base.replace("today", "tonight")  # one-word edit → high jaccard
    far = "completely different content about spark shuffles and parquet readers"
    rows = [(0, base), (1, near), (2, far), (3, base), (4, "tiny doc")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(spark, docs):
    groups = {r["keep_id"]: r["n_docs"] for r in content_digest_groups(docs, "doc_id", "text").collect()}
    assert groups[0] == 2  # docs 0 and 3 identical, keep 0
    assert groups[1] == 1 and groups[2] == 1


def test_lsh_recalls_planted_near_dup(spark, docs):
    pairs = {(r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(docs, "doc_id", "text").collect()}
    assert (0, 3) in pairs  # exact dup always collides
    assert (0, 1) in pairs or (1, 3) in pairs  # one-word edit recalled
    assert (0, 2) not in pairs and (1, 2) not in pairs  # unrelated doc not


def test_jaccard_verifies_candidates(spark, docs):
    out = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in ngram_jaccard_on_candidates(docs, "doc_id", "text", 0.5).collect()}
    assert out[(0, 3)] == 1.0
    assert any(p in out and 0.5 <= out[p] < 1.0 for p in [(0, 1), (1, 3)])


def test_simhash_exact_dup_collides(spark, docs):
    pairs = {(r["id_a"], r["id_b"]) for r in simhash_collision_pairs(docs, "doc_id", "text").collect()}
    assert (0, 3) in pairs


def test_simhash64_banded_equals_naive_hamming(spark, docs):
    """Banded candidate generation + exact verify returns exactly the pairs
    a naive all-pairs Hamming scan would (pigeonhole recall guarantee)."""
    from itertools import combinations

    from fn_rq_report_etl_dev_spark.operators.text_dedup import (
        simhash64,
        simhash64_near_pairs,
    )

    sigs = {r["__id"]: r["simhash64"] for r in simhash64(docs, "doc_id", "text").collect()}
    assert all(len(s) == 64 and set(s) <= {"0", "1"} for s in sigs.values())
    naive = {
        (a, b): sum(x != y for x, y in zip(sigs[a], sigs[b]))
        for a, b in combinations(sorted(sigs), 2)
        if sum(x != y for x, y in zip(sigs[a], sigs[b])) <= 3
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash64_near_pairs(docs, "doc_id", "text", max_hamming=3).collect()
    }
    assert got == naive
    assert got[(0, 3)] == 0  # exact dup → identical signature


def test_bucket_pairs_capped_matches_naive(spark):
    """A pathological hot bucket (150 ids, cap 16 → ~10 chunks) produces
    exactly the naive triangle pair set, with id_a < id_b, and never holds
    more than max_bucket ids in one collected array."""
    from itertools import combinations

    from fn_rq_report_etl_dev_spark.operators.text_dedup import _bucket_pairs

    rows = [("hot", f"d{i:04d}") for i in range(150)]
    rows += [("pair", "x1"), ("pair", "x2"), ("solo", "y1")]
    df = spark.createDataFrame(rows, "bkt string, __id string")
    out = _bucket_pairs(df, ["bkt"], keep=["bkt"], max_bucket=16).collect()
    got = {(r["id_a"], r["id_b"]) for r in out}
    expect = set(combinations([f"d{i:04d}" for i in range(150)], 2)) | {("x1", "x2")}
    assert got == expect
    assert all(r["id_a"] < r["id_b"] for r in out)
    assert all(r["bkt"] == ("pair" if r["id_a"] == "x1" else "hot") for r in out)


def test_bruteforce_topk_finds_self_and_respects_k(spark):
    rows = [(i, [float(i == j) for j in range(4)]) for i in range(4)]
    rows.append((4, [1.0, 0.0, 0.0, 0.001]))  # near-parallel to vec 0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = brute_force_topk(df.filter("vec_id = 0"), df, k=2, exclude_self=True).collect()
    assert [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])][0] == 4
    assert len(out) == 2


def test_signlsh_only_scans_own_bucket(spark):
    rows = [
        (0, [1.0, 1.0, 1.0, 1.0]),
        (1, [0.9, 1.1, 0.8, 1.0]),   # same sign bucket as 0
        (2, [-1.0, 1.0, 1.0, 1.0]),  # different bucket
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = signlsh_topk(df.filter("vec_id = 0"), df, k=5, n_bits=4, exclude_self=True).collect()
    assert [r["neighbor_id"] for r in out] == [1]


def test_multimodal_asset_and_fake_decode(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, None)], "doc_id long, text string"
    )
    assets = to_asset_table(df, "doc_id", "text", "text/plain")
    meta = {r["asset_id"]: r for r in assets.collect()}
    assert meta[1]["n_bytes"] == 11
    assert meta[1]["content_md5"] == "5eb63bbbe01eeed093cb22bb8f5acdc3"  # md5('hello world')
    assert meta[2]["payload"] is None and meta[2]["n_bytes"] is None

    feats = {r["asset_id"]: r for r in
             decode_features(assets, deterministic_fake=True).collect()}
    assert len(feats[1]["features"]) == FEATURE_DIM
    assert abs(sum(feats[1]["features"]) - 1.0) < 1e-6  # normalized histogram
    assert feats[1]["decode_ok"] is True
    assert feats[2]["features"] is None


def test_multimodal_stub_raises_without_codec(spark):
    df = spark.createDataFrame([(1, "payload")], "doc_id long, text string")
    assets = to_asset_table(df, "doc_id", "text", "image/jpeg")
    with pytest.raises(Exception, match="NotImplementedError|no media codec"):
        decode_features(assets).collect()


def test_multimodal_codec_import_gate():
    """Without the optional libs, codec builders fail fast at BUILD time
    (driver-side ImportError) — never a mid-job executor surprise."""
    from fn_rq_report_etl_dev_spark.operators.multimodal import codec_for_mime

    has_pil = True
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        has_pil = False
    if not has_pil:
        with pytest.raises(ImportError):
            codec_for_mime("image/png")
    with pytest.raises(NotImplementedError, match="video"):
        codec_for_mime("video/mp4")


def test_multimodal_real_image_decode(spark):
    """Real Pillow decode end-to-end through the Arrow mapInPandas path
    (runs only where the optional dependency is installed)."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    from fn_rq_report_etl_dev_spark.operators.multimodal import codec_for_mime

    buf = io.BytesIO()
    PIL_Image.new("RGB", (16, 16), color=(255, 0, 0)).save(buf, format="PNG")
    rows = [(1, bytearray(buf.getvalue())), (2, bytearray(b"not a png"))]
    df = spark.createDataFrame(rows, "asset_id long, raw binary")
    assets = to_asset_table(df, "asset_id", "raw", "image/png")
    out = {r["asset_id"]: r for r in
           decode_features(assets, decode_fn=codec_for_mime("image/png")).collect()}
    assert out[1]["decode_ok"] is True
    assert len(out[1]["features"]) == FEATURE_DIM
    assert abs(sum(out[1]["features"]) - 1.0) < 1e-6
    assert out[2]["decode_ok"] is False and out[2]["features"] is None


def test_ivf_topk_probes_nearest_cells(spark, sf_dir):
    from fn_rq_report_etl_dev_spark.operators.similarity import brute_force_topk, ivf_topk
    from fn_rq_report_etl_dev_spark.workloads import load

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 5")
    ivf = ivf_topk(queries, emb, k=3, n_cells=8, n_probe=4, exclude_self=True)
    exact = brute_force_topk(queries, emb, k=3, exclude_self=True)
    got = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in ivf.collect()}
    best = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in exact.collect()}
    assert len({q for q, _ in got}) == 5  # every query answered with k results
    # probing half the cells recovers a decent share of the exact top-3
    overlap = sum(1 for key, n in got.items() if best.get(key) == n or n in
                  [v for (q, _), v in best.items() if q == key[0]])
    assert overlap >= 5


def test_pii_redaction_on_planted_pii(spark):
    from pyspark.sql import functions as F

    from fn_rq_report_etl_dev_spark.functions.text import pii_count, pii_redact

    df = spark.createDataFrame(
        [(1, "reach me at jane.doe@example.com or 555-123-4567, SSN 123-45-6789"),
         (2, "no pii here"),
         (3, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in df.select(
        "doc_id",
        pii_count(F.col("text")).alias("n"),
        pii_redact(F.col("text")).alias("red"),
    ).collect()}
    assert out[1]["n"] == 3
    assert "[REDACTED]" in out[1]["red"]
    assert "example.com" not in out[1]["red"] and "123-45-6789" not in out[1]["red"]
    assert out[2]["n"] == 0 and out[2]["red"] == "no pii here"
    assert out[3]["n"] is None and out[3]["red"] is None


def test_connected_components_transitive_clusters(spark):
    from fn_rq_report_etl_dev_spark.operators.graph import (
        cluster_survivors,
        connected_components,
    )

    nodes = spark.createDataFrame([(i,) for i in range(7)], "id long")
    # chain 0-1-2-3 (transitive!), pair 5-6, isolated 4
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    comp = {r["id"]: r["component"] for r in
            connected_components(nodes, edges).collect()}
    assert comp == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 5, 6: 5}

    surv = {r["component"]: (r["survivor_id"], r["n_members"]) for r in
            cluster_survivors(connected_components(nodes, edges)).collect()}
    assert surv == {0: (0, 4), 4: (4, 1), 5: (5, 2)}


def test_multimodal_stdlib_wav_decode(spark):
    """REAL audio decode with no optional deps: stdlib wave PCM parse
    through the full Arrow mapInPandas path. A constant-zero signal lands
    entirely in the middle amplitude bucket; a corrupt payload degrades to
    decode_ok=False without failing the job."""
    import io
    import struct
    import wave as wave_mod

    from fn_rq_report_etl_dev_spark.operators.multimodal import codec_for_mime

    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        # 100 stereo frames of silence + 10 of full-scale positive
        wf.writeframes(struct.pack("<200h", *([0] * 200)))
        wf.writeframes(struct.pack("<20h", *([32000] * 20)))
    rows = [(1, bytearray(buf.getvalue())), (2, bytearray(b"RIFFgarbage"))]
    df = spark.createDataFrame(rows, "asset_id long, raw binary")
    assets = to_asset_table(df, "asset_id", "raw", "audio/wav")
    out = {r["asset_id"]: r for r in
           decode_features(assets, decode_fn=codec_for_mime("audio/wav")).collect()}
    f = out[1]["features"]
    assert out[1]["decode_ok"] is True and len(f) == FEATURE_DIM
    assert abs(sum(f) - 1.0) < 1e-6
    assert f[FEATURE_DIM // 2] > 0.85          # silence bucket dominates
    assert f[FEATURE_DIM - 1] > 0.0            # loud tail present
    assert out[2]["decode_ok"] is False and out[2]["features"] is None


def test_multimodal_stdlib_ppm_decode(spark):
    """REAL image decode with no optional deps: binary P6 PPM parse. A
    half-black/half-white image splits its luminance histogram between the
    darkest and brightest buckets exactly."""
    from fn_rq_report_etl_dev_spark.operators.multimodal import codec_for_mime

    w, h = 4, 2
    raster = bytes([0, 0, 0] * 4 + [255, 255, 255] * 4)
    ppm = b"P6\n# comment\n4 2\n255\n" + raster
    pgm = b"P5\n2 2\n255\n" + bytes([0, 128, 128, 255])
    rows = [(1, bytearray(ppm))]
    df = spark.createDataFrame(rows, "asset_id long, raw binary")
    assets = to_asset_table(df, "asset_id", "raw", "image/x-portable-pixmap")
    out = decode_features(
        assets, decode_fn=codec_for_mime("image/x-portable-pixmap")
    ).collect()[0]
    f = out["features"]
    assert out["decode_ok"] is True
    assert f[0] == 0.5 and f[FEATURE_DIM - 1] == 0.5
    assert sum(f) == 1.0
    # PGM grayscale path, direct decode
    g = codec_for_mime("image/x-portable-graymap")(pgm)
    assert sum(g) == 1.0 and g[0] == 0.25 and g[FEATURE_DIM - 1] == 0.25


def _make_y4m(luma_frames: list[bytes], w: int = 4, h: int = 2) -> bytes:
    """Synthesize a C420 YUV4MPEG2 payload from raw luma planes."""
    parts = [b"YUV4MPEG2 W%d H%d F2:1 Ip A1:1 C420\n" % (w, h)]
    for y in luma_frames:
        assert len(y) == w * h
        parts.append(b"FRAME\n" + y + bytes(w * h // 2))  # zero chroma
    return b"".join(parts)


def test_multimodal_stdlib_y4m_video_decode(spark):
    """REAL video decode with no optional deps: YUV4MPEG2 rawvideo through
    the full Arrow mapInPandas path. Default stride 2 samples frames
    0 and 2 (both all-dark) of a dark/bright alternation, so the darkest
    luminance bucket takes the whole histogram; a corrupt payload degrades
    to decode_ok=False without failing the job."""
    from fn_rq_report_etl_dev_spark.operators.multimodal import codec_for_mime

    dark, bright = bytes(8), bytes([255] * 8)
    good = _make_y4m([dark, bright, dark, bright])
    rows = [(1, bytearray(good)), (2, bytearray(b"YUV4MPEG2 garbage"))]
    df = spark.createDataFrame(rows, "asset_id long, raw binary")
    assets = to_asset_table(df, "asset_id", "raw", "video/x-yuv4mpegpipe")
    out = {
        r["asset_id"]: r
        for r in decode_features(
            assets, decode_fn=codec_for_mime("video/x-yuv4mpegpipe")
        ).collect()
    }
    f = out[1]["features"]
    assert out[1]["decode_ok"] is True and len(f) == FEATURE_DIM
    assert f[0] == 1.0 and sum(f) == 1.0
    assert out[2]["decode_ok"] is False and out[2]["features"] is None
    # stride 1 sees the bright frames too: exact 50/50 split
    g = codec_for_mime("video/x-yuv4mpegpipe")
    from fn_rq_report_etl_dev_spark.operators.multimodal import y4m_video_decoder

    g1 = y4m_video_decoder(frame_stride=1)(good)
    assert g1[0] == 0.5 and g1[FEATURE_DIM - 1] == 0.5


def test_multimodal_decode_frames_fanout(spark):
    """decode_frames = the execution half of frame_sample_plan: one output
    row per sampled frame with per-frame luma features, fanned out inside
    mapInPandas (no explode shuffle). Corrupt assets keep a single
    decode_ok=False row."""
    from fn_rq_report_etl_dev_spark.operators.multimodal import decode_frames

    dark, bright = bytes(8), bytes([255] * 8)
    good = _make_y4m([dark, bright, dark])
    rows = [(1, bytearray(good)), (2, bytearray(b"not video"))]
    df = spark.createDataFrame(rows, "asset_id long, raw binary")
    assets = to_asset_table(df, "asset_id", "raw", "video/x-yuv4mpegpipe")
    out = decode_frames(assets, frame_stride=1).collect()
    by_key = {(r["asset_id"], r["frame_idx"]): r for r in out}
    assert len(out) == 4  # 3 frames + 1 failure row
    assert by_key[(1, 0)]["features"][0] == 1.0
    assert by_key[(1, 1)]["features"][FEATURE_DIM - 1] == 1.0
    assert by_key[(1, 2)]["features"][0] == 1.0
    assert by_key[(2, None)]["decode_ok"] is False
    # stride 2 skips the bright middle frame
    sampled = decode_frames(assets.filter("asset_id = 1"), frame_stride=2).collect()
    assert sorted(r["frame_idx"] for r in sampled) == [0, 2]


def test_multimodal_wav_24bit_and_pgm_16bit():
    """ADVICE r02 hardening: 24-bit PCM decodes (sign-extended little-
    endian), and 16-bit PNM parses as 2-byte big-endian samples instead of
    being silently misread."""
    import io
    import wave as wave_mod

    from fn_rq_report_etl_dev_spark.operators.multimodal import (
        ppm_image_decoder,
        wave_audio_decoder,
    )

    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(3)
        wf.setframerate(8000)
        # -2^23 (min), 0, +2^23-1 (max) as 3-byte little-endian
        frames = (
            (-8388608).to_bytes(3, "little", signed=True)
            + (0).to_bytes(3, "little", signed=True)
            + (8388607).to_bytes(3, "little", signed=True)
        )
        wf.writeframes(frames)
    f = wave_audio_decoder()(buf.getvalue())
    assert f[0] > 0 and f[FEATURE_DIM // 2] > 0 and f[FEATURE_DIM - 1] > 0
    assert abs(sum(f) - 1.0) < 1e-9

    # 16-bit PGM: maxval 65535, big-endian samples 0 and 65535
    pgm16 = b"P5\n2 1\n65535\n" + (0).to_bytes(2, "big") + (65535).to_bytes(2, "big")
    g = ppm_image_decoder()(pgm16)
    assert g[0] == 0.5 and g[FEATURE_DIM - 1] == 0.5

    # ADVICE r03: some PNM writers emit a trailing newline after the
    # raster; an odd tail must not break the 2-byte big-endian parse.
    assert ppm_image_decoder()(pgm16 + b"\n") == g
    # truncated 16-bit raster still errors clearly
    import pytest as _pytest
    with _pytest.raises(ValueError, match="truncated"):
        ppm_image_decoder()(pgm16[:-1])


def test_udtf_sql_registration_lateral_join(spark):
    """UDTFs are SQL-surface citizens too: register the table function and
    call it from SQL with a correlated LATERAL join — the form a SQL-only
    consumer of the engine would use."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="idx int, word string")
    class WordSplit:
        def eval(self, text: str):
            if text is None:
                return
            for i, w in enumerate(text.split()):
                yield i, w

    spark.udtf.register("word_split_sql", WordSplit)
    spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma")], "doc_id long, text string"
    ).createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        """
        SELECT d.doc_id, s.idx, s.word
        FROM udtf_docs d, LATERAL word_split_sql(d.text) s
        ORDER BY d.doc_id, s.idx
        """
    ).collect()
    assert [(r["doc_id"], r["idx"], r["word"]) for r in rows] == [
        (1, 0, "alpha"), (1, 1, "beta"), (2, 0, "gamma"),
    ]


def test_quantized_rerank_equals_bruteforce(spark, sf_dir):
    """Int8 candidate gen + exact rerank must lose nothing vs brute force
    at a 32-vs-5 margin (the workload's oracle depends on this)."""
    from pyspark.sql import functions as F

    from fn_rq_report_etl_dev_spark.operators.similarity import (
        brute_force_topk,
        quantized_rerank_topk,
    )
    from fn_rq_report_etl_dev_spark.workloads import load

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], round(r["cos"], 12))
        for r in quantized_rerank_topk(q, emb, k=5, m=32, exclude_self=True).collect()
    }
    exp = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], round(r["cos"], 12))
        for r in brute_force_topk(q, emb, k=5, exclude_self=True).collect()
    }
    assert got == exp and len(got) == 40


def test_quantize_int8_packing_roundtrip(spark):
    """qvec is one int8 byte per dimension; dequantized values stay within
    scale/2 of the original (round-to-nearest), and the zero vector maps
    to scale 1.0 without dividing by zero."""
    import numpy as np

    from fn_rq_report_etl_dev_spark.operators.similarity import quantize_int8

    rows = [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    q1 = np.frombuffer(out[1]["qvec"], dtype=np.int8)
    s1 = out[1]["qscale"]
    assert len(q1) == 4
    assert np.all(np.abs(q1 * s1 - np.array(rows[0][1])) <= s1 / 2 + 1e-12)
    assert out[2]["qscale"] == 1.0
    assert np.frombuffer(out[2]["qvec"], dtype=np.int8).tolist() == [0, 0, 0, 0]


def test_countmin_never_underestimates_and_grid_is_bounded(spark):
    """CM invariants on a synthetic stream: est >= true for every item,
    and the grid has at most depth*width rows (the fixed shuffle bound)."""
    from fn_rq_report_etl_dev_spark.operators.sketches import (
        cm_estimate,
        countmin_table,
    )

    rows = [("a",)] * 50 + [("b",)] * 20 + [(f"x{i}",) for i in range(200)]
    items = spark.createDataFrame(rows, "word string")
    cms = countmin_table(items, "word", width=64, depth=4)
    assert cms.count() <= 4 * 64
    cand = items.distinct()
    est = {r["word"]: r["cms_est"] for r in cm_estimate(cms, cand, "word", width=64, depth=4).collect()}
    true = {"a": 50, "b": 20, **{f"x{i}": 1 for i in range(200)}}
    assert all(est[w] >= n for w, n in true.items())
    # heavy hitters stay well-separated from the tail at this width
    assert est["a"] >= 50 and est["b"] >= 20


def test_ivf_handles_empty_corpus(spark):
    """A zero-row corpus yields a valid zero-cell index and empty query
    results — not a k-means crash on a 0xd sample (empty partitions and
    empty days are routine at scale; scripts_empty_audit.py sweeps all
    registered queries)."""
    from fn_rq_report_etl_dev_spark.operators.similarity import (
        build_ivf_index,
        ivf_query,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    idx = build_ivf_index(empty, n_cells=8, seed=42)
    assert idx.centroids.count() == 0
    out = ivf_query(idx, empty, k=3, n_probe=2)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "rank", "cos"]


def test_pnm_resize_box_means_and_rgb(spark):
    """pnm_resize: exact integer box means for P5; P6 keeps channels
    separate; dimension-divisibility and identity-factor checks."""
    import numpy as np

    from fn_rq_report_etl_dev_spark.operators.multimodal import (
        _parse_pnm,
        encode_pgm,
        pnm_resize,
    )

    # 4x4 gradient -> 2x2: each output is the floor-mean of a 2x2 block
    px = np.arange(16).reshape(4, 4)
    small = pnm_resize(2)(encode_pgm(px, 4, 4))
    _, w, h, _, raster = _parse_pnm(small)
    assert (w, h) == (2, 2)
    assert raster.tolist() == [
        (0 + 1 + 4 + 5) // 4, (2 + 3 + 6 + 7) // 4,
        (8 + 9 + 12 + 13) // 4, (10 + 11 + 14 + 15) // 4,
    ]
    # factor 1 = identity raster
    same = pnm_resize(1)(encode_pgm(px, 4, 4))
    assert _parse_pnm(same)[4].tolist() == px.flatten().tolist()
    # P6: channels stay independent
    rgb = b"P6\n2 2\n255\n" + bytes([10, 20, 30, 10, 20, 30, 50, 60, 70, 50, 60, 70])
    small_rgb = pnm_resize(2)(rgb)
    assert _parse_pnm(small_rgb)[4].tolist() == [30, 40, 50]
    import pytest as _pytest
    with _pytest.raises(ValueError, match="divisible"):
        pnm_resize(3)(encode_pgm(px, 4, 4))


def test_substring_runs_planted_passage(spark):
    """Two otherwise-distinct docs share a 7-token passage: with k=5
    shingles each doc must report exactly one maximal run of length 7
    (= 3 duplicated shingles merged by the islands trick), at the right
    1-based start position. A third doc with no 5-gram in common
    reports nothing, and a doc shorter than k is skipped outright."""
    from fn_rq_report_etl_dev_spark.operators.text_dedup import (
        substring_duplicate_runs,
    )

    passage = "one two three four five six seven"  # 7 tokens
    rows = [
        (0, f"alpha beta {passage} gamma delta"),  # run starts at pos 3
        (1, f"{passage} omega psi chi phi"),       # run starts at pos 1
        (2, "nothing shared here at all beyond stray words"),
        (3, "too short"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = substring_duplicate_runs(df, "doc_id", "text", k=5).collect()
    got = {(r.doc_id, r.run_start, r.run_len_tokens, r.n_shingles) for r in out}
    assert got == {(0, 3, 7, 3), (1, 1, 7, 3)}


def test_substring_runs_same_doc_repeat(spark):
    """A passage repeated INSIDE one document counts as duplicated too
    (suffix-array semantics: >=2 occurrences anywhere), and two maximal
    runs are reported for the two disjoint occurrences."""
    from fn_rq_report_etl_dev_spark.operators.text_dedup import (
        substring_duplicate_runs,
    )

    p = "a b c d e"  # exactly k tokens
    df = spark.createDataFrame(
        [(0, f"{p} filler words here then again {p} tail")],
        "doc_id long, text string",
    )
    out = substring_duplicate_runs(df, "doc_id", "text", k=5).collect()
    got = {(r.doc_id, r.run_start, r.run_len_tokens, r.n_shingles) for r in out}
    assert got == {(0, 1, 5, 1), (0, 11, 5, 1)}


def test_substring_clip_removes_planted_passage(spark):
    """ExactSubstr cut semantics: both occurrences of a shared 7-token
    passage are stripped (all-sites cut), surrounding unique tokens
    survive in order, a fully-duplicated doc clips to '', and sub-k or
    untouched docs pass through intact."""
    from fn_rq_report_etl_dev_spark.operators.text_dedup import (
        substring_clip,
    )

    passage = "one two three four five six seven"
    rows = [
        (0, f"alpha beta {passage} gamma delta"),
        (1, f"{passage} omega psi chi phi"),
        (2, passage),      # entire doc duplicated -> ''
        (3, "too short"),  # sub-k, untouched
        (4, "totally unique words that appear nowhere else in this corpus"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in substring_clip(df, "doc_id", "text", k=5).collect()}
    assert (out[0].n_tokens, out[0].n_removed) == (11, 7)
    assert out[0].text_clean == "alpha beta gamma delta"
    assert (out[1].n_tokens, out[1].n_removed) == (11, 7)
    assert out[1].text_clean == "omega psi chi phi"
    assert (out[2].n_tokens, out[2].n_removed) == (7, 7)
    assert out[2].text_clean == ""
    assert (out[3].n_removed, out[3].text_clean) == (0, "too short")
    assert out[4].n_removed == 0


def test_substring_keepfirst_retains_canonical_copy(spark):
    """keep_first cut: the lexicographically-first occurrence of the
    shared passage survives intact (doc 0 here), every repeat is
    clipped — including a same-doc second occurrence, whose first copy
    survives within the same document."""
    from fn_rq_report_etl_dev_spark.operators.text_dedup import (
        substring_clip,
    )

    passage = "one two three four five six seven"
    rows = [
        (0, f"alpha beta {passage} gamma delta"),
        (1, f"{passage} omega psi chi phi"),
        (2, "a b c d e filler words here then again a b c d e"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in substring_clip(
            df, "doc_id", "text", k=5, keep_first=True
        ).collect()
    }
    # doc 0 holds every canonical site -> nothing removed
    assert out[0].n_removed == 0
    assert out[0].text_clean == f"alpha beta {passage} gamma delta"
    # doc 1 is the repeat -> passage clipped, unique tail survives
    assert out[1].n_removed == 7
    assert out[1].text_clean == "omega psi chi phi"
    # doc 2: first in-doc copy survives, second clipped
    assert out[2].n_removed == 5
    assert out[2].text_clean == "a b c d e filler words here then again"


def test_substring_ops_dirty_ids_match_oracle_semantics(spark):
    """Dirty-data fidelity for the substring family (the seams the
    adversarial sweeps probe): NULL doc_ids group as one pseudo-doc in
    both engines, a duplicated doc_id with DIFFERENT text merges
    position-wise with the (pos, tok) tie-break pinned, and keep_first's
    canonical site treats NULL doc_id as SMALLEST (Spark min-struct
    ordering — the oracle pins NULLS FIRST to match)."""
    from pyspark.sql import functions as F

    from fn_rq_report_etl_dev_spark.operators.text_dedup import (
        substring_clip,
        substring_duplicate_runs,
    )

    passage = "one two three four five"
    rows = [
        (None, f"{passage} unique nulldoc tail words here"),
        (7, f"{passage} second doc tail pieces again"),
        (9, "x1 x2 x3 x4 x5 x6"),
        (9, "y1 y2 y3 y4 y5 y6"),  # same id, different text
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    runs = substring_duplicate_runs(df, "doc_id", "text", k=5).collect()
    by_doc = {}
    for r in runs:
        by_doc.setdefault(r.doc_id, []).append(r)
    # passage duplicated between NULL-doc and doc 7 -> one run each
    assert len(by_doc.get(None, [])) == 1 and len(by_doc.get(7, [])) == 1
    assert by_doc[None][0].run_len_tokens == 5
    # doc 9's two texts share no 5-gram -> no runs
    assert 9 not in by_doc
    # keep_first: NULL doc_id is the canonical site (sorts smallest),
    # so doc 7 loses the passage and the NULL pseudo-doc keeps it.
    kf = {
        (r.doc_id, r.text_clean)
        for r in substring_clip(
            df, "doc_id", "text", k=5, keep_first=True
        ).collect()
        if r.doc_id is None or r.doc_id == 7
    }
    assert (None, f"{passage} unique nulldoc tail words here") in kf
    assert (7, "second doc tail pieces again") in kf
    # duplicate doc_id: the two rows merge into ONE pseudo-doc row
    # (ADVICE r07 — per-doc totals keep n_removed non-negative):
    # n_tokens sums both rows, nothing is duplicated so nothing is
    # removed, and the surviving tokens interleave by the pinned
    # (pos, tok) tie-break.
    clip = substring_clip(df, "doc_id", "text", k=5).collect()
    doc9 = [r for r in clip if r.doc_id == 9]
    assert len(doc9) == 1
    assert doc9[0].n_tokens == 12 and doc9[0].n_removed == 0
    assert doc9[0].text_clean == (
        "x1 y1 x2 y2 x3 y3 x4 y4 x5 y5 x6 y6"
    )


def test_collocations_pmi_planted_phrase(spark):
    """A planted adjacent phrase gets the expected exact counts and an
    IEEE-identical lift; bigrams under the support floor are absent."""
    from pyspark.sql import functions as F

    from fn_rq_report_etl_dev_spark.functions import text as TXT
    from fn_rq_report_etl_dev_spark.operators.text_dedup import word_ngrams

    text = "new york " * 6 + "alpha beta gamma delta"
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    ws = df.select(TXT.words(F.col("text")).alias("ws"))
    nu = ws.select(F.explode("ws")).count()
    nb = ws.select(F.explode(word_ngrams(F.col("ws"), 2))).count()
    from fn_rq_report_etl_dev_spark.workloads.llmops import (
        text_collocations_pmi,
    )
    import tempfile

    # route through a parquet dir so the workload's load() sees it
    d = tempfile.mkdtemp(prefix="pmi-")
    df.withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("t")
    ).withColumn("n_chars", F.length("text")).write.parquet(f"{d}/documents.parquet")
    out = {r.bigram: r for r in text_collocations_pmi(spark, d).collect()}
    r = out["new york"]
    assert (r.c_ab, r.c_a, r.c_b) == (6, 6, 6)
    assert r.lift == ((6.0 * nu) * nu) / (((1.0 * nb) * 6.0) * 6.0)
    # "york new" occurs 5 times -> exactly at the >=5 support floor
    assert out["york new"].c_ab == 5
    # single-occurrence bigrams sit under the floor
    assert "beta gamma" not in out and "york alpha" not in out


def test_image_hash_functions():
    """average_hash64 and dct_phash64 contracts: identical payloads →
    identical hashes; a one-step brightness perturbation → small (or
    zero) Hamming distance; a single-cosine-basis image puts the DCT
    hash's energy exactly where the analytic DCT says; P6 color path
    and NULL payloads honor the decode_fn contract."""
    import numpy as np

    from fn_rq_report_etl_dev_spark.operators.multimodal import (
        average_hash64,
        dct_phash64,
        encode_pgm,
    )

    rng_v = ((np.arange(64, dtype=np.int64) * 7919 + 13) * 31) % 251
    img = np.repeat(
        np.repeat(rng_v.reshape(8, 8).astype(np.uint8), 4, axis=0), 4, axis=1
    )
    p1 = encode_pgm(img, 32, 32)
    a1, d1 = average_hash64(p1), dct_phash64(p1)
    assert len(a1) == 64 and set(a1) <= {"0", "1"}
    assert len(d1) == 64 and set(d1) <= {"0", "1"}
    assert average_hash64(p1) == a1 and dct_phash64(p1) == d1  # deterministic
    # exact expected aHash bits: 64*sum_k > total over the 4x4 block sums
    sums = 16 * rng_v
    want = "".join("1" if 64 * s > sums.sum() else "0" for s in sums)
    assert a1 == want
    # tiny perturbation: one block one step brighter -> aHash near-dup
    img2 = img.copy()
    img2[0:4, 0:4] = np.minimum(img2[0:4, 0:4].astype(np.int64) + 1, 255).astype(
        np.uint8
    )
    p2 = encode_pgm(img2, 32, 32)
    ham_a = sum(x != y for x, y in zip(a1, average_hash64(p2)))
    assert ham_a <= 3
    # uniform brightness shift: aHash EXACTLY invariant (all block sums
    # shift equally — integer arithmetic); DCT pHash only approximately so
    # (in exact math just the zeroed DC term moves, but an UNSTRUCTURED
    # random image puts many AC coefficients knife-edge at the median, and
    # float residue flips those freely — measured 9 flips at shift=+4 on
    # this fixture). That spread is the precise reason the oracle entry
    # rides the integer-exact aHash; the structural DCT pin is the
    # single-cosine-basis check below, so here we only bound the flips
    # away from "hash changed wholesale" (a random re-draw expects ~32).
    img3 = (img.astype(np.int64) + 4).astype(np.uint8)  # values <= 250+4
    p3 = encode_pgm(img3, 32, 32)
    assert average_hash64(p3) == a1
    assert sum(x != y for x, y in zip(d1, dct_phash64(p3))) <= 16
    # single-cosine image: DCT energy concentrates at (u0, v0)=(2, 3);
    # the hash bit at 8*u0+v0 must be set (the only large coefficient)
    x = np.arange(32)
    basis = np.cos(np.pi * (2 * x + 1) * 2 / 64)[:, None] * np.cos(
        np.pi * (2 * x + 1) * 3 / 64
    )[None, :]
    imgc = np.clip(128 + 100 * basis, 0, 255).astype(np.uint8)
    dc = dct_phash64(encode_pgm(imgc, 32, 32))
    assert dc[8 * 2 + 3] == "1"
    # NULL payload contract
    assert average_hash64(None) is None and dct_phash64(None) is None
    # P6 color path: gray RGB equals the P5 luma hash
    rgb = np.repeat(img.reshape(32, 32, 1), 3, axis=2)
    p6 = b"P6\n32 32\n255\n" + rgb.astype(np.uint8).tobytes()
    assert average_hash64(p6) == a1


def test_banded_hamming_pairs_shared_engine(spark):
    """banded_hamming_pairs (the machinery simhash64_near_pairs now
    delegates to) on hand-built signatures: hamming 0/1/3 pairs found,
    hamming 4 pair absent (outside threshold), full pigeonhole recall."""
    from fn_rq_report_etl_dev_spark.operators.text_dedup import (
        banded_hamming_pairs,
    )

    def flip(s, *positions):
        out = list(s)
        for p in positions:
            out[p] = "1" if out[p] == "0" else "0"
        return "".join(out)

    base = "01" * 32
    flip1 = flip(base, 0)                   # hamming 1 vs base
    flip3 = flip(base, 5, 25, 45)           # hamming 3 vs base
    flip4 = flip(base, 0, 1, 2, 3)          # hamming 4 vs base
    sig = spark.createDataFrame(
        [(1, base), (2, base), (3, flip1), (4, flip3), (5, flip4)],
        "__id long, bits string",
    )
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in banded_hamming_pairs(sig, "bits", max_hamming=3).collect()
    }
    assert got[(1, 2)] == 0
    assert got[(1, 3)] == 1 and got[(2, 3)] == 1
    assert got[(1, 4)] == 3 and got[(2, 4)] == 3
    assert (1, 5) not in got and (2, 5) not in got


def test_bpe_planted_merge_sequence(spark):
    """The textbook BPE example: a corpus where every merge argmax is
    hand-computable. hug×4, pug×2, hugs×1 ⇒ pair weights (u,g)=7,
    (h,u)=5, (p,u)=2, (g,s)=1, so the learned sequence is exactly
    ug → hug → pug → hugs, after which every word is one symbol and the
    learner stops early (4 rows despite n_merges=6)."""
    from pyspark.sql import functions as F

    from fn_rq_report_etl_dev_spark.operators.tokenizer import (
        bpe_pair_merges,
    )

    wf = spark.createDataFrame(
        [("hug", 4), ("pug", 2), ("hugs", 1)], "word string, freq long"
    )
    rows = bpe_pair_merges(wf, "word", "freq", n_merges=6).collect()
    got = [(r.merge_rank, r.sym_a, r.sym_b, r.merged, r.pair_weight) for r in rows]
    assert got == [
        (1, "u", "g", "ug", 7),
        (2, "h", "ug", "hug", 5),
        (3, "p", "ug", "pug", 2),
        (4, "hug", "s", "hugs", 1),
    ]
    # NULL/empty words carry no symbols and must not crash or count
    wf2 = spark.createDataFrame(
        [("aa", 3), ("", 9), (None, 9)], "word string, freq long"
    )
    rows2 = bpe_pair_merges(wf2, "word", "freq", n_merges=2).collect()
    assert [(r.sym_a, r.sym_b, r.pair_weight) for r in rows2] == [("a", "a", 3)]
    # NULL freq coalesces to 0 on BOTH paths (ADVICE r09: the driver
    # loop crashed with TypeError while the distributed rounds skipped
    # the NULL in F.sum): the word still rewrites, contributes 0 weight.
    wf3 = spark.createDataFrame(
        [("ug", 4), ("bug", None)], "word string, freq long"
    )
    for limit in (65536, 0):  # driver loop, then distributed rounds
        rows3 = bpe_pair_merges(
            wf3, "word", "freq", n_merges=1, driver_vocab_limit=limit
        ).collect()
        assert [
            (r.sym_a, r.sym_b, r.pair_weight) for r in rows3
        ] == [("u", "g", 4)], f"limit={limit}"


def test_bpe_tokenize_planted_counts(spark, tmp_path):
    """text_bpe_tokenize on the hug/pug/hugs corpus: the 4 learned
    merges collapse every word to ONE symbol, so each doc's subword
    count equals its word count; a word built from merged symbols plus
    a leftover char ('hugs' before its own merge would be 2) is covered
    by mixed-word docs replayed against the Python reference."""
    from pyspark.sql import functions as F

    from fn_rq_report_etl_dev_spark.workloads.llmops import (
        text_bpe_tokenize,
    )

    rows = [
        (0, "hug hug hug hug"),
        (1, "pug pug hugs"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path / "bpe")
    df.withColumn("source", F.lit("t")).withColumn(
        "lang", F.lit("en")
    ).withColumn("n_chars", F.length("text")).write.parquet(
        f"{d}/documents.parquet"
    )
    out = {r.doc_id: r for r in text_bpe_tokenize(spark, d).collect()}
    # merges: ug, hug, pug, hugs (then exhausted) -> every word 1 symbol
    assert out[0].n_words == 4 and out[0].n_subwords == 4
    assert out[1].n_words == 3 and out[1].n_subwords == 3


def test_collocations_pmi_shuffle_join_path(spark, sf_dir):
    """broadcast_vocab=False (the open-vocabulary degradation path,
    ADVICE r07) removes the broadcast hints from the unigram joins —
    the plan shuffles on the word key — and produces identical rows."""
    from fn_rq_report_etl_dev_spark.workloads.llmops import (
        text_collocations_pmi,
    )

    hinted = text_collocations_pmi(spark, sf_dir)
    shuffled = text_collocations_pmi(spark, sf_dir, broadcast_vocab=False)
    # Hint-level check (physical join choice would be AQE's to make on a
    # tiny fixture): hinted plan carries 3 broadcast hints (ua, ub,
    # totals), the degraded plan only the 1-row totals hint.
    n_hints_on = hinted._jdf.queryExecution().analyzed().toString().count(
        "ResolvedHint"
    )
    n_hints_off = shuffled._jdf.queryExecution().analyzed().toString().count(
        "ResolvedHint"
    )
    assert n_hints_on == 3 and n_hints_off == 1
    assert sorted(map(tuple, hinted.collect())) == sorted(
        map(tuple, shuffled.collect())
    )


def test_kmeans_lloyd_planted_clusters(spark):
    """Two well-separated planted clusters: after 3 rounds every member
    lands in its cluster's cell and dist is the exact sqdist to the
    final (fixed-point mean) centroid."""
    from fn_rq_report_etl_dev_spark.operators.similarity import kmeans_lloyd

    rows = (
        [(i, [10.0 + 0.25 * i, 0.0]) for i in range(4)]
        + [(10 + i, [0.0, -5.0 - 0.5 * i]) for i in range(4)]
    )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in kmeans_lloyd(df, k=2, rounds=3).collect()}
    assert len(out) == 8
    cells_a = {out[i].cell for i in range(4)}
    cells_b = {out[10 + i].cell for i in range(4)}
    assert len(cells_a) == 1 and len(cells_b) == 1 and cells_a != cells_b
    # centroid of cluster A = fixed-point mean of [10, 10.25, 10.5, 10.75]
    comps = [int(__import__("math").floor(x * 1048576.0)) for x in (10.0, 10.25, 10.5, 10.75)]
    mean0 = (float(sum(comps)) / 1048576.0) / 4.0 + 0.0
    a0 = out[0]
    want = 0.0
    for x, c in zip([10.0, 0.0], [mean0, 0.0]):
        want = want + (x - c) * (x - c)
    assert a0.dist == want


def test_kmeans_lloyd_empty_and_fewer_than_k(spark):
    from fn_rq_report_etl_dev_spark.operators.similarity import kmeans_lloyd

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert kmeans_lloyd(empty, k=3, rounds=2).count() == 0
    two = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    got = {r.vec_id: r.cell for r in kmeans_lloyd(two, k=4, rounds=2).collect()}
    assert len(got) == 2 and got[1] != got[2]


def test_semantic_dedup_scoping_and_centrality(spark):
    """semantic_dedup contract on a hand-built index: (a) duplicates in
    the SAME cell collapse to the more-central member even when it has
    the larger id, (b) identical vectors in DIFFERENT cells are never
    compared (cluster scoping), (c) equal centrality keeps the smaller
    id, (d) non-dups all survive."""
    from fn_rq_report_etl_dev_spark.operators.similarity import (
        IvfIndex,
        semantic_dedup,
    )

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cell int, centroid array<double>"
    )
    assigned = spark.createDataFrame(
        [
            # cell 0: 25 is less central than 30 (same direction, cos≈0.994)
            (25, [0.9, 0.1], 0),
            (30, [1.0, 0.0], 0),
            # cell 0 vs cell 1: identical vectors, different cells → both kept
            (40, [0.5, 0.5], 0),
            (41, [0.5, 0.5], 1),
            # cell 1: equal centrality (identical) → smaller id kept
            (50, [0.0, 1.0], 1),
            (51, [0.0, 1.0], 1),
            # cell 1: orthogonal to everything in its cell → kept
            (60, [1.0, -1.0], 1),
        ],
        "neighbor_id long, cv array<double>, cell int",
    )
    out = {r.vec_id: r.kept for r in semantic_dedup(IvfIndex(cents, assigned), min_cosine=0.95).collect()}
    assert out == {25: 0, 30: 1, 40: 1, 41: 1, 50: 1, 51: 0, 60: 1}


def test_semantic_dedup_hot_cell_salt_split(spark):
    """Cells above ``max_cell`` are salt-split (VERDICT r08 hot-cell
    guard): comparisons happen only within
    (cell, md5(vec_id) % ceil(size/max_cell)). Six identical vectors in
    one cell: uncapped they collapse to the single smallest id; with
    max_cell=2 (g=3) each md5 sub-cell keeps its own smallest id — the
    survivor set is exactly one per NON-EMPTY sub-cell, replayed here
    with hashlib as the independent salt reference."""
    import hashlib

    from fn_rq_report_etl_dev_spark.operators.similarity import (
        IvfIndex,
        semantic_dedup,
    )

    ids = [10, 11, 12, 13, 14, 15]
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0])], "cell int, centroid array<double>"
    )
    assigned = spark.createDataFrame(
        [(i, [1.0, 0.0], 0) for i in ids],
        "neighbor_id long, cv array<double>, cell int",
    )
    idx = IvfIndex(cents, assigned)

    out = {
        r.vec_id: r.kept
        for r in semantic_dedup(idx, min_cosine=0.95, max_cell=1024).collect()
    }
    assert out == {10: 1, 11: 0, 12: 0, 13: 0, 14: 0, 15: 0}

    g = 3  # ceil(6 / max_cell=2)
    salt = {
        i: int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % g
        for i in ids
    }
    # Phase 1 only (exemplar_bridge=False — the scaling experiment's
    # measurement arm): one survivor per non-empty md5 sub-cell.
    expected = {
        i: 1 if i == min(j for j in ids if salt[j] == salt[i]) else 0
        for i in ids
    }
    got = {
        r.vec_id: r.kept
        for r in semantic_dedup(
            idx, min_cosine=0.95, max_cell=2, exemplar_bridge=False
        ).collect()
    }
    assert got == expected
    assert sum(got.values()) == len(set(salt.values()))

    # With the exemplar bridge (the default, VERDICT r10 ask #4): each
    # sub-cell's exemplar (its min-(cd, id) member — here the min id,
    # all vectors identical) joins a cross-sub-cell pass that is itself
    # capped by a SECOND-level salt, salt2 = md5int(id) %
    # ceil(n_salt/max_cell) — at max_cell=2 the 3 exemplars split mod 2,
    # so the survivor set is one exemplar per non-empty salt2 group
    # (the full hashlib replay of the two-level recurrence):
    exemplars = {
        s: min(j for j in ids if salt[j] == s) for s in set(salt.values())
    }
    g2 = (g - 1) // 2 + 1
    salt2 = {
        e: int(hashlib.md5(str(e).encode()).hexdigest()[:8], 16) % g2
        for e in exemplars.values()
    }
    bridge_survivors = {
        min(e for e in salt2 if salt2[e] == v) for v in set(salt2.values())
    }
    expected_b = {i: 1 if i in bridge_survivors else 0 for i in ids}
    got_b = {
        r.vec_id: r.kept
        for r in semantic_dedup(idx, min_cosine=0.95, max_cell=2).collect()
    }
    assert got_b == expected_b
    # and with a roomier cap (max_cell=4 -> n_salt=2 exemplars, one
    # salt2 group) the identical-vector hot cell collapses back to the
    # EXACT uncapped answer: only the global smallest id survives.
    got_c = {
        r.vec_id: r.kept
        for r in semantic_dedup(idx, min_cosine=0.95, max_cell=4).collect()
    }
    assert got_c == {10: 1, 11: 0, 12: 0, 13: 0, 14: 0, 15: 0}


def test_wave_pcm_samples_exact_dyadic_roundtrip():
    """wave_pcm_samples returns the exact dyadic sample values (v/32768
    for 16-bit) so block-mean comparisons equal integer amplitude
    comparisons; stereo averages to mono; NULL passes through."""
    import io
    import wave

    import numpy as np

    from fn_rq_report_etl_dev_spark.operators.multimodal import wave_pcm_samples

    dec = wave_pcm_samples()
    amps = np.array([0, 1, -1, 4095, -4096, 32767, -32768], dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(amps.tobytes())
    got = dec(buf.getvalue())
    assert got == [float(a) / 32768.0 for a in amps]  # exact, not approx
    # stereo: interleaved (L, R) averages to mono
    st = io.BytesIO()
    with wave.open(st, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(np.array([100, 300, -50, -150], dtype="<i2").tobytes())
    assert dec(st.getvalue()) == [200.0 / 32768.0, -100.0 / 32768.0]
    assert dec(None) is None


def test_audio_fingerprint_planted_groups(spark, sf_dir):
    """dedup_audio_fingerprint contract on the planted corpus: docs
    sharing doc_id % 29 (both unperturbed) collide at hamming 0; a
    perturbed member (doc_id % 13 == 0) sits within hamming <= 2 of its
    group (one block change flips at most the 2 adjacent comparison
    bits) — inside the banded join's <= 3 full-recall bound."""
    from fn_rq_report_etl_dev_spark.workloads import QUERIES

    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in QUERIES["dedup_audio_fingerprint"](spark, sf_dir).collect()
    }
    # 30 and 59 share group 1, neither is %13: identical audio
    assert pairs[(30, 59)] == 0
    # 13 is perturbed; 42 shares group 13 and is clean. One block change
    # flips at most the 2 adjacent comparison bits — and flips NONE when
    # the +16 step doesn't cross either neighbor's amplitude (the case
    # here): still a near-dup, never past the recall bound.
    assert pairs[(13, 42)] <= 2
    # FULL RECALL within groups: every clean same-group pair is present
    # at hamming 0 (the pigeonhole guarantee the banded join provides).
    clean = [d for d in range(500) if d % 13 != 0]
    by_group: dict[int, list[int]] = {}
    for d in clean:
        by_group.setdefault(d % 29, []).append(d)
    for g, ds in by_group.items():
        for i, a in enumerate(ds):
            for b in ds[i + 1 :]:
                assert pairs.get((a, b)) == 0, (a, b)
    # threshold respected everywhere; cross-group pairs DO occur at <= 3
    # (comparison-bit fingerprints of modular sawtooths have correlated
    # wraparound positions — an honest property of the bit scheme on
    # periodic signals, replayed identically by the oracle)
    assert all(h <= 3 for h in pairs.values())


def test_video_framehash_planted_duplicates(spark, sf_dir):
    """dedup_video_framehash on the sf0.001 fixture: docs sharing
    doc_id % 31 synthesize identical y4m streams (when neither carries
    the every-12th perturbation), so their pooled frame hashes collide
    at hamming 0; every reported pair respects the hamming <= 3 contract
    and the id_a < id_b orientation."""
    from fn_rq_report_etl_dev_spark.workloads import QUERIES

    out = QUERIES["dedup_video_framehash"](spark, sf_dir).collect()
    pairs = {(r.id_a, r.id_b): r.hamming for r in out}
    # 5 and 67: same mod-31 class (5), neither divisible by 12.
    assert pairs[(5, 67)] == 0
    assert all(h <= 3 for h in pairs.values())
    assert all(a < b for a, b in pairs)


def test_spread_for_decode_gate(spark):
    """spread_for_decode repartitions a parallelism-starved input up to
    defaultParallelism but returns a well-split input UNTOUCHED (r08
    nit: the unconditional repartition taxed inputs already matching
    the cluster)."""
    from fn_rq_report_etl_dev_spark.operators.multimodal import (
        spread_for_decode,
    )

    par = spark.sparkContext.defaultParallelism
    starved = spark.range(100).coalesce(1)
    assert starved.rdd.getNumPartitions() == 1
    assert spread_for_decode(starved).rdd.getNumPartitions() == par
    wide = spark.range(1000).repartition(par)
    assert spread_for_decode(wide) is wide


def test_video_frameshift_catches_what_pooling_misses(spark, tmp_path):
    """dedup_video_frameshift's raison d'être (VERDICT r10 ask #6): an
    offset/trimmed near-duplicate video. Docs 9 (trimmed: pattern frames
    3..9) and 40 (untrimmed: 0..6) share class 9 (id % 31) and exactly 4
    of 7 pattern frames. The whole-video MAJORITY-POOLED hash re-votes
    over the shifted frame set and lands far outside the banded engine's
    hamming<=3 recall bound (asserted by replaying the pooling in
    Python), while the frame vote pairs them at >= 4 matches."""
    from pyspark.sql import functions as F

    from fn_rq_report_etl_dev_spark.workloads.llmops import (
        dedup_video_frameshift,
    )

    def frame_bits(d, f):
        shift = 3 if d % 9 == 0 else 0
        v = [
            ((1 + d % 31) * (p + 5) * (p + 13) + (f + shift) * 17)
            * 2654435761 % 251
            for p in range(64)
        ]
        tot = sum(v)
        return [1 if 64 * x > tot else 0 for x in v]

    def pooled(d):
        fb = [frame_bits(d, f) for f in range(7)]
        return [1 if 2 * sum(b[p] for b in fb) >= 7 else 0 for p in range(64)]

    pooled_dist = sum(a != b for a, b in zip(pooled(9), pooled(40)))
    assert pooled_dist > 3, (
        f"fixture regression: pooled hashes only {pooled_dist} bits apart "
        "— the planted offset case no longer demonstrates the pooling gap"
    )
    # exact frame-level overlap: trimmed {3..9} vs untrimmed {0..6} share
    # pattern frames {3,4,5,6} — at least 4 identical bit vectors (the
    # deterministic fixture adds one accidental post-threshold collision
    # between distinct pattern frames, which only helps the vote)
    exact_matches = sum(
        frame_bits(9, f) == frame_bits(40, g)
        for f in range(7)
        for g in range(7)
    )
    assert exact_matches >= 4

    rows = [(9,), (40,), (1,), (63,)]  # 1: other class; 63: trimmed class 1
    df = spark.createDataFrame(rows, "doc_id long")
    d = str(tmp_path / "vids")
    df.select(
        "doc_id",
        F.lit("src").alias("source"),
        F.lit("en").alias("lang"),
        F.lit("x").alias("text"),
        F.lit(1).cast("bigint").alias("n_chars"),
    ).write.parquet(f"{d}/documents.parquet")
    out = {
        (r.id_a, r.id_b): r.n_frame_matches
        for r in dedup_video_frameshift(spark, d).collect()
    }
    assert (9, 40) in out and out[(9, 40)] >= 4
    # class 1's trimmed rendition pairs with its base the same way
    assert (1, 63) in out and out[(1, 63)] >= 4
    # no CROSS-class pairs survive the vote
    assert not {(1, 9), (1, 40), (9, 63), (40, 63)} & set(out)


def test_frame_vote_pairs_non_default_bound_and_vote(spark):
    """frame_vote_pairs (r11, VERDICT r10 ask #4): the composite-id bound
    and vote threshold are OPERATOR ARGS — exercised here at a
    non-default bound (4, not 8) and both sides of the vote threshold."""
    from fn_rq_report_etl_dev_spark.operators.multimodal import (
        frame_vote_pairs,
    )

    p0, p1 = "0" * 64, "1" * 64
    p2, p3 = "01" * 32, "0" * 32 + "1" * 32  # pairwise hamming >= 32
    rows = [
        (0, 0, p0), (0, 1, p1), (0, 2, p2),   # video 0
        (1, 0, p0), (1, 1, p1), (1, 2, p3),   # video 1: shares p0, p1
    ]
    frames = spark.createDataFrame(
        rows, "video_id long, frame_idx int, bits string"
    )
    got = frame_vote_pairs(
        frames, "video_id", "frame_idx", "bits",
        frames_per_video_bound=4, min_frame_votes=2,
    ).collect()
    assert [(r.id_a, r.id_b, r.n_frame_matches) for r in got] == [(0, 1, 2)]
    # raising the vote threshold past the 2 shared frames drops the pair
    assert (
        frame_vote_pairs(
            frames, "video_id", "frame_idx", "bits",
            frames_per_video_bound=4, min_frame_votes=3,
        ).count()
        == 0
    )


def test_frame_vote_pairs_guards(spark):
    """Arg validation is eager (a wrong bound MERGES unrelated videos);
    out-of-range frame indexes fail at execution, never aliasing into a
    neighboring video's composite-id space."""
    from fn_rq_report_etl_dev_spark.operators.multimodal import (
        frame_vote_pairs,
    )

    frames = spark.createDataFrame(
        [(0, 5, "0" * 64), (1, 1, "0" * 64)],
        "video_id long, frame_idx int, bits string",
    )
    with pytest.raises(ValueError, match="frames_per_video_bound"):
        frame_vote_pairs(
            frames, "video_id", "frame_idx", "bits", frames_per_video_bound=0
        )
    with pytest.raises(ValueError, match="min_frame_votes"):
        frame_vote_pairs(
            frames, "video_id", "frame_idx", "bits", min_frame_votes=0
        )
    with pytest.raises(Exception, match="frame index outside"):
        # frame 5 >= bound 4 -> in-plan assert fires on execution
        frame_vote_pairs(
            frames, "video_id", "frame_idx", "bits", frames_per_video_bound=4
        ).collect()
