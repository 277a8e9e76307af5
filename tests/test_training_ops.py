"""Training-data ops: dedup on planted near-duplicates, similarity search,
text stats, multimodal plumbing."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from oplogtoredis_ray.pipelines.dedup import (
    exact_dedup,
    minhash_lsh_dedup,
    simhash_dedup,
)
from oplogtoredis_ray.pipelines.similarity import knn_brute, lsh_signatures
from oplogtoredis_ray.stages.multimodal import (
    FrameSampleStage,
    MediaFeatureStage,
    fake_decoder,
    synthesize_media_table,
)
from oplogtoredis_ray.stages.text import TextStats

BASE = (
    "the quick brown fox jumps over the lazy dog while the rain in spain "
    "falls mainly on the plain and every good boy deserves fudge today"
)


def _docs_with_near_dups():
    rng = np.random.default_rng(3)
    words = BASE.split()
    docs = []
    for i in range(40):
        w = [words[j] for j in rng.integers(0, len(words), 30)]
        docs.append(" ".join(w))
    # plant near-dup pairs: 40/41 near-identical, 42/43 identical
    docs.append(docs[0] + " extra")
    docs.append(docs[0] + " other")
    docs.append(docs[5])
    docs.append(docs[5])
    return pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64), "text": docs})


@pytest.mark.usefixtures("ray_session")
class TestDedup:
    def test_exact_dedup_finds_planted(self):
        import ray.data as rd

        df = _docs_with_near_dups()
        out = exact_dedup(rd.from_pandas(df)).to_pandas()
        # doc 5, 42, 43 share content → one survivor with count 3
        assert (out["dup_count"] >= 3).any()
        row = out[out["dup_count"] >= 3].iloc[0]
        assert row["doc_id"] == 5
        assert len(out) == len(df) - 2  # two duplicate rows collapsed

    def test_minhash_lsh_clusters_near_dups(self):
        import ray.data as rd

        df = _docs_with_near_dups()
        out = minhash_lsh_dedup(
            rd.from_pandas(df), shingle_k=3, jaccard_threshold=0.7
        ).to_pandas()  # returns a Dataset: assignment is distributed
        cl = dict(zip(out["doc_id"], out["cluster_id"]))
        # exact copies cluster together
        assert cl[5] == cl[42] == cl[43]
        # near-identical docs cluster with their source
        assert cl[40] == cl[0]
        # unrelated doc keeps its own cluster
        assert cl[7] == 7

    def test_simhash_pairs_close(self):
        import ray.data as rd

        df = _docs_with_near_dups()
        pairs = simhash_dedup(rd.from_pandas(df), hamming_max=6).to_pandas()
        got = {tuple(sorted((a, b))) for a, b in zip(pairs["a_id"], pairs["b_id"])}
        assert (5, 42) in got or (42, 43) in got  # identical docs → hamming 0

    def test_minhash_verify_runs_distributed(self, tmp_path, monkeypatch):
        """The exact-Jaccard verification must run on the cluster, not the
        driver: poison the DRIVER process's shingle kernel and plant a hot
        bucket with a large candidate set — the pipeline only succeeds if
        every shingle computation (sign + verify) happens in worker
        processes, which import the module fresh and never see the patch."""
        import ray.data as rd

        from oplogtoredis_ray.pipelines import dedup

        rng = np.random.default_rng(11)
        words = BASE.split()
        hot = " ".join(words[:12])  # 30 identical docs → C(30,2) candidates/band
        docs = [hot] * 30 + [
            " ".join(words[j] for j in rng.integers(0, len(words), 30))
            for _ in range(10)
        ]
        df = pd.DataFrame(
            {"doc_id": np.arange(len(docs), dtype=np.int64), "text": docs}
        )

        def _driver_poison(*a, **k):
            raise AssertionError("shingle_hashes ran on the driver")

        monkeypatch.setattr(dedup, "shingle_hashes", _driver_poison)
        od = str(tmp_path / "oracle")
        out = minhash_lsh_dedup(
            rd.from_pandas(df), shingle_k=3, jaccard_threshold=0.7,
            materialize_dir=od,
        ).to_pandas()
        cl = dict(zip(out["doc_id"], out["cluster_id"]))
        assert all(cl[i] == 0 for i in range(30))  # hot family → one cluster
        assert all(cl[i] != 0 for i in range(30, 40))  # others stay out of it
        # shingle export written by the distributed explode stage
        import glob as _glob

        files = _glob.glob(os.path.join(od, "minhash_shingles", "*.parquet"))
        assert files
        # no truncation at the default cap; stats exported either way
        assert dedup.LAST_TRUNCATION_STATS["dropped_ids"] == 0
        assert os.path.exists(os.path.join(od, "minhash_metrics.json"))

    def test_minhash_hot_bucket_truncation_counted(self, tmp_path):
        """candidate_cap knob: a hot bucket larger than the cap truncates,
        and the GLOBAL lost-recall count is surfaced (not just logged)."""
        import json

        import ray.data as rd

        from oplogtoredis_ray.pipelines import dedup

        words = BASE.split()
        hot = " ".join(words[:12])
        df = pd.DataFrame(
            {"doc_id": np.arange(30, dtype=np.int64), "text": [hot] * 30}
        )
        od = str(tmp_path / "oracle")
        out = minhash_lsh_dedup(
            rd.from_pandas(df), shingle_k=3, jaccard_threshold=0.7,
            materialize_dir=od, candidate_cap=5,
        ).to_pandas()
        stats = dedup.LAST_TRUNCATION_STATS
        assert stats["candidate_cap"] == 5
        assert stats["truncated_buckets"] > 0
        assert stats["dropped_ids"] > 0
        with open(os.path.join(od, "minhash_metrics.json")) as f:
            assert json.load(f) == stats
        # capped ids still cluster; ids beyond the cap degrade to singletons
        cl = dict(zip(out["doc_id"], out["cluster_id"]))
        assert sum(1 for i in range(30) if cl[i] == 0) >= 5


@pytest.mark.usefixtures("ray_session")
class TestSimilarity:
    def test_knn_self_is_rank1(self):
        import ray.data as rd

        rng = np.random.default_rng(0)
        M = rng.standard_normal((100, 16))
        tbl = pa.table(
            {
                "vec_id": pa.array(np.arange(100), type=pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(M.ravel(), type=pa.float32()), 16
                ).cast(pa.list_(pa.float32())),
            }
        )
        ds = rd.from_arrow(tbl)
        out = knn_brute(ds, {3: M[3], 7: M[7]}, k=5)
        top = out[out["rank"] == 1].set_index("query_id")["neighbor_id"]
        assert top[3] == 3 and top[7] == 7
        assert (out.groupby("query_id").size() == 5).all()

    def test_lsh_signatures_deterministic_and_binning(self):
        rng = np.random.default_rng(1)
        M = rng.standard_normal((50, 16))
        s1 = lsh_signatures(M, num_planes=12, seed=5)
        s2 = lsh_signatures(M, num_planes=12, seed=5)
        assert np.array_equal(s1, s2)
        # a vector and its small perturbation share a bucket most of the time
        Mp = M + 1e-6
        assert (lsh_signatures(Mp, 12, 5) == s1).mean() > 0.9


class TestTextStats:
    def test_vectorized_stats(self):
        batch = pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "text": pa.array(["the cat sat on the mat", "abc123 !!"]),
            }
        )
        out = TextStats()(batch).to_pandas()
        assert out["n_tokens"].tolist() == [6, 2]
        assert out["lang_pred"].tolist() == ["en", "other"]
        assert out["n_alpha"].tolist() == [17, 3]
        assert (out["quality_bucket"] >= 0).all() and (out["quality_bucket"] <= 10).all()
        assert out["fp"].str.len().eq(16).all()


class TestMultimodal:
    def test_stub_raises_without_decoder(self):
        t = synthesize_media_table(4)
        stage = MediaFeatureStage()
        with pytest.raises(NotImplementedError):
            stage(t)

    def test_feature_stage_with_fake_decoder(self):
        t = synthesize_media_table(6, payload_bytes=1024)
        out = MediaFeatureStage(decoder=fake_decoder, feature_dim=8)(t)
        assert out.num_rows == 6
        assert out["payload_bytes"].to_pylist() == [1024] * 6
        feats = np.array(out["feature"].to_pylist())
        assert feats.shape == (6, 8)
        # deterministic: same payloads → same features
        again = MediaFeatureStage(decoder=fake_decoder, feature_dim=8)(t)
        assert np.array_equal(feats, np.array(again["feature"].to_pylist()))

    def test_frame_sampling_flatmap(self):
        t = synthesize_media_table(3, payload_bytes=400)
        out = FrameSampleStage(k_frames=4)(t)
        assert out.num_rows == 12
        assert out["frame_idx"].to_pylist() == [0, 1, 2, 3] * 3
        assert all(len(b) == 100 for b in out["frame"].to_pylist())

    @pytest.mark.usefixtures("ray_session")
    def test_media_pipeline_actor_pool(self):
        import ray.data as rd

        ds = rd.from_arrow(synthesize_media_table(32, payload_bytes=2048))
        out = ds.map_batches(
            MediaFeatureStage,
            fn_constructor_kwargs={"decoder": fake_decoder, "feature_dim": 4},
            batch_format="pyarrow",
            batch_size=8,
            concurrency=2,
        ).to_pandas()
        assert len(out) == 32


@pytest.mark.usefixtures("ray_session")
def test_ivf_topk_recall_vs_brute():
    """IVF scale path: deterministic, self is found, recall@10 well above
    random (cluster pruning bounded by nprobe/nlist)."""
    import ray.data as rd

    from oplogtoredis_ray.pipelines.similarity import ivf_topk

    rng = np.random.default_rng(4)
    M = rng.standard_normal((400, 32))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(400), type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(M.ravel(), type=pa.float32()), 32
            ).cast(pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(tbl)
    queries = {int(i): M[i] for i in (5, 77, 200)}
    exact = knn_brute(ds, queries, k=10)
    approx = ivf_topk(ds, queries, k=10, nlist=8, nprobe=3)
    again = ivf_topk(ds, queries, k=10, nlist=8, nprobe=3)
    pd.testing.assert_frame_equal(approx, again)  # deterministic
    # self always lands in its own probe set
    top1 = approx[approx["rank"] == 1].set_index("query_id")["neighbor_id"]
    assert all(top1[q] == q for q in queries)
    # recall vs brute force clearly better than random
    recalls = []
    for q in queries:
        e = set(exact[exact["query_id"] == q]["neighbor_id"])
        a = set(approx[approx["query_id"] == q]["neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5, recalls


class TestCodecs:
    """Container-free real codecs (functions/codecs.py): encode→decode
    roundtrips and magic-byte dispatch."""

    def test_ppm_roundtrip(self):
        from oplogtoredis_ray.functions.codecs import decode_ppm, encode_ppm

        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
        assert np.array_equal(decode_ppm(encode_ppm(img)), img)
        gray = rng.integers(0, 256, (4, 6), dtype=np.uint8)
        assert np.array_equal(decode_ppm(encode_ppm(gray)), gray)

    def test_ppm_header_comments(self):
        from oplogtoredis_ray.functions.codecs import decode_ppm

        img = b"P6\n# a comment\n2 1\n255\n" + bytes([1, 2, 3, 4, 5, 6])
        out = decode_ppm(img)
        assert out.shape == (1, 2, 3)
        assert out[0, 1].tolist() == [4, 5, 6]

    def test_bmp_roundtrip_with_row_padding(self):
        from oplogtoredis_ray.functions.codecs import decode_bmp, encode_bmp

        rng = np.random.default_rng(2)
        # width 5 → stride 16 (padding exercised); bottom-up + BGR handled
        img = rng.integers(0, 256, (3, 5, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)

    def test_wav_roundtrip(self):
        from oplogtoredis_ray.functions.codecs import (
            decode_wav,
            encode_wav,
            wav_sample_rate,
        )

        rng = np.random.default_rng(3)
        clip = rng.integers(-30000, 30000, (500, 2)).astype(np.int16)
        payload = encode_wav(clip, rate=22050)
        assert np.array_equal(decode_wav(payload), clip)
        assert wav_sample_rate(payload) == 22050

    def test_default_decoder_dispatch_and_stub(self):
        from oplogtoredis_ray.functions.codecs import (
            default_decoder,
            encode_bmp,
            encode_ppm,
            encode_wav,
        )

        from oplogtoredis_ray.functions.codecs import encode_png

        img = np.zeros((2, 2, 3), dtype=np.uint8)
        assert default_decoder(encode_ppm(img), "image/x-portable-pixmap").shape == (2, 2, 3)
        assert default_decoder(encode_bmp(img), "image/bmp").shape == (2, 2, 3)
        assert default_decoder(encode_png(img), "image/png").shape == (2, 2, 3)
        clip = np.zeros((10, 1), dtype=np.int16)
        assert default_decoder(encode_wav(clip), "audio/wav").shape == (10, 1)
        with pytest.raises(NotImplementedError):  # JPEG needs a codec library
            default_decoder(b"\xff\xd8\xff\xe0....", "image/jpeg")

    def test_png_roundtrip_all_filters_and_layouts(self):
        from oplogtoredis_ray.functions.codecs import decode_png, encode_png

        rng = np.random.default_rng(4)
        for shape in [(7, 5), (7, 5, 2), (12, 16, 3), (9, 11, 4), (1, 1, 3)]:
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            for ft in [0, 1, 2, 3, 4, "mixed"]:
                out = decode_png(encode_png(img, filter_type=ft))
                assert np.array_equal(out, img), (shape, ft)

    def test_png_golden_handbuilt(self):
        """Decode a PNG built BY HAND from the spec (chunk layout, Sub and
        Up filters, zlib IDAT) — independent of our own encoder."""
        import struct
        import zlib

        from oplogtoredis_ray.functions.codecs import decode_png

        def chunk(ctype, data):
            return (
                struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
            )

        # 2x2 RGB; row0 Sub-filtered, row1 Up-filtered
        raw = (
            b"\x01" + bytes([10, 20, 30, 30, 40, 50])
            + b"\x02" + bytes([5, 5, 5, 10, 10, 10])
        )
        payload = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )
        want = np.array(
            [[[10, 20, 30], [40, 60, 80]], [[15, 25, 35], [50, 70, 90]]],
            dtype=np.uint8,
        )
        assert np.array_equal(decode_png(payload), want)

    def test_png_rejects_malformed(self):
        import struct
        import zlib

        from oplogtoredis_ray.functions.codecs import (
            MediaDecodeError,
            decode_png,
            encode_png,
        )

        img = np.zeros((3, 3, 3), dtype=np.uint8)
        good = encode_png(img)
        # corrupt one IDAT byte → CRC must catch it
        bad = bytearray(good)
        idat_at = good.index(b"IDAT") + 4
        bad[idat_at] ^= 0xFF
        with pytest.raises(MediaDecodeError, match="CRC"):
            decode_png(bytes(bad))
        with pytest.raises(MediaDecodeError, match="IEND"):
            decode_png(good[:-12])  # IEND stripped

        def chunk(ctype, data):
            return (
                struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
            )

        sig = b"\x89PNG\r\n\x1a\n"
        idat = chunk(b"IDAT", zlib.compress(b"\x00\x00\x00\x00"))
        # palette (colortype 3), 16-bit depth, interlaced: all out of scope
        for ihdr_fields, msg in [
            ((1, 1, 8, 3, 0, 0, 0), "color type"),
            ((1, 1, 16, 0, 0, 0, 0), "8-bit"),
            ((1, 1, 8, 0, 0, 0, 1), "interlaced"),
        ]:
            p = sig + chunk(b"IHDR", struct.pack(">IIBBBBB", *ihdr_fields)) + idat + chunk(b"IEND", b"")
            with pytest.raises(MediaDecodeError, match=msg):
                decode_png(p)

    @pytest.mark.usefixtures("ray_session")
    def test_media_pipeline_real_decoder_actor_pool(self):
        """e2e: MediaFeatureStage with NO injected decoder over genuinely
        decodable payloads (PPM/BMP/WAV round-robin)."""
        import ray.data as rd

        from oplogtoredis_ray.stages.multimodal import synthesize_decodable_media_table

        t = synthesize_decodable_media_table(24, seed=7)
        out = (
            rd.from_arrow(t)
            .map_batches(
                MediaFeatureStage,
                fn_constructor_kwargs={"feature_dim": 6},
                batch_format="pyarrow",
                batch_size=8,
                concurrency=2,
            )
            .to_pandas()
        )
        assert len(out) == 24
        feats = np.stack(out.sort_values("media_id")["feature"].to_numpy())
        assert feats.shape == (24, 6)
        # deterministic across runs
        again = MediaFeatureStage(feature_dim=6)(t).to_pandas()
        assert np.array_equal(
            feats, np.stack(again.sort_values("media_id")["feature"].to_numpy())
        )


@pytest.mark.usefixtures("ray_session")
def test_lsh_neardup_pairs_finds_planted(tmp_path):
    """Planted near-identical vectors share a hyperplane bucket w.h.p. and
    must surface as a pair; the exported assignment parquet exists for
    oracle replay."""
    import os

    import ray.data as rd

    from oplogtoredis_ray.pipelines.similarity import lsh_neardup_pairs

    rng = np.random.default_rng(5)
    M = rng.standard_normal((200, 16))
    M[150] = M[3] + 1e-4 * rng.standard_normal(16)  # planted near-dup
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(200), type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(M.ravel(), type=pa.float64()), 16
            ).cast(pa.list_(pa.float64())),
        }
    )
    out_dir = str(tmp_path / "oracle")
    pairs = lsh_neardup_pairs(
        rd.from_arrow(tbl), num_planes=4, threshold=0.9, materialize_dir=out_dir
    ).to_pandas()
    got = {tuple(p) for p in pairs[["a_id", "b_id"]].to_numpy()}
    assert (3, 150) in got
    assert os.path.isdir(os.path.join(out_dir, "lsh_assign"))
    # canonical ordering
    assert (pairs["a_id"] < pairs["b_id"]).all()


class TestLangIDAndQuality:
    def test_lang_id_ngram_profiles(self):
        from oplogtoredis_ray.stages.text import _token_lists, lang_id_ngram

        docs = pa.array(
            [
                "the cat sat and it is that for you to see",
                "der Hund ist nicht mit der Katze und das ist gut",
                "le chat est dans la maison et je vous aime pour cela",
                "el perro es para los gatos y como una casa por ahora",
                "zzz qqq xxx",  # no profile hits → other
            ]
        )
        flat, parents, n = _token_lists(docs)
        pred = lang_id_ngram(flat, parents, n).to_pylist()
        assert pred == ["en", "de", "fr", "es", "other"]

    def test_stopword_and_punct_columns(self):
        from oplogtoredis_ray.stages.text import TextStats

        t = pa.table(
            {
                "doc_id": pa.array([0, 1], type=pa.int64()),
                "text": pa.array(
                    [
                        "The cat and the dog, in a house!",
                        "buy cheap pills now!!! $$$ click click",
                    ]
                ),
            }
        )
        out = TextStats()(t)
        # doc 0: stopwords the,and,the,in,a → 5 of 8 tokens → bucket 6
        assert out["n_stopwords"].to_pylist() == [5, 0]
        assert out["stopword_bucket"].to_pylist() == [6, 0]
        # punctuation: ",!" → 2; "!!!" + "$$$" → 6
        assert out["n_punct"].to_pylist() == [2, 6]


class TestCodecProperties:
    """Property-based roundtrips: any valid image/clip shape survives
    encode→decode bit-exactly (stride padding, bottom-up rows, channel
    interleave all exercised by random shapes)."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        h=st.integers(1, 24), w=st.integers(1, 24),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=30, deadline=None)
    def test_ppm_roundtrip_any_shape(self, h, w, seed):
        from oplogtoredis_ray.functions.codecs import decode_ppm, encode_ppm

        img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_ppm(encode_ppm(img)), img)

    @given(
        h=st.integers(1, 24), w=st.integers(1, 24),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=30, deadline=None)
    def test_bmp_roundtrip_any_shape(self, h, w, seed):
        from oplogtoredis_ray.functions.codecs import decode_bmp, encode_bmp

        img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)

    @given(
        h=st.integers(1, 24), w=st.integers(1, 24), ch=st.integers(1, 4),
        ft=st.sampled_from([0, 1, 2, 3, 4, "mixed"]),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_png_roundtrip_any_shape(self, h, w, ch, ft, seed):
        from oplogtoredis_ray.functions.codecs import decode_png, encode_png

        img = np.random.default_rng(seed).integers(
            0, 256, (h, w, ch), dtype=np.uint8
        )
        out = decode_png(encode_png(img, filter_type=ft))
        want = img.reshape(h, w) if ch == 1 else img
        assert np.array_equal(out, want)

    @given(
        n=st.integers(1, 400), ch=st.integers(1, 2),
        rate=st.sampled_from([8000, 16000, 44100]),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=30, deadline=None)
    def test_wav_roundtrip_any_clip(self, n, ch, rate, seed):
        from oplogtoredis_ray.functions.codecs import (
            decode_wav, encode_wav, wav_sample_rate,
        )

        clip = (
            np.random.default_rng(seed)
            .integers(-32768, 32767, (n, ch))
            .astype(np.int16)
        )
        payload = encode_wav(clip, rate=rate)
        assert np.array_equal(decode_wav(payload), clip)
        assert wav_sample_rate(payload) == rate


@pytest.mark.usefixtures("ray_session")
def test_curate_corpus_composite(tmp_path):
    """The curation composite end-to-end on planted docs: low-quality and
    non-English docs filtered, exact dups collapsed, near-dups dropped,
    survivors keep their token counts."""
    import ray.data as rd

    from oplogtoredis_ray.pipelines.curate import curate_corpus

    good = (
        "the quick brown fox jumps over the lazy dog and it is that kind "
        "of day for you to see the plain rain in spain falling mainly"
    )
    docs = [
        good,                                  # 0: survives
        good,                                  # 1: exact dup of 0 → dropped
        good + " extra trailing words here",   # 2: near-dup of 0 → dropped
        "der Hund ist nicht mit der Katze und das ist gut so heute",  # 3: lang != en
        "!!! ### $$$ %%% ^^^ &&& *** ((( )))",  # 4: quality_bucket ≈ 0
        "every good boy deserves fudge and the cat sat on the mat today "
        "while it is sunny outside for a walk in the park with friends",  # 5: survives
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64), "text": docs})
    out = (
        curate_corpus(
            rd.from_pandas(df),
            work_dir=str(tmp_path / "work"),
            jaccard_threshold=0.5,
            shingle_k=3,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [0, 5]
    assert out["n_tokens"].tolist() == [len(good.split()), len(docs[5].split())]
    import os

    assert os.path.isdir(str(tmp_path / "work" / "curate_survivors"))


@pytest.mark.usefixtures("ray_session")
class TestBatchConstruction:
    """Sequence packing + stratified sampling (training-batch ops)."""

    def _docs_table(self, tmp_path):
        import pyarrow.parquet as pq

        rng = np.random.default_rng(9)
        words = BASE.split()
        rows = []
        langs = ["en", "en", "en", "de", "fr", "es", "xx"]
        for i in range(120):
            n = int(rng.integers(5, 120))
            rows.append(
                {
                    "doc_id": i,
                    "text": " ".join(words[j] for j in rng.integers(0, len(words), n)),
                    "lang": langs[i % len(langs)],
                    "source": "synth",
                    "n_chars": 0,
                }
            )
        d = tmp_path / "sf"
        os.makedirs(d, exist_ok=True)
        pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
        return str(d)

    def test_pack_sequences_budget_and_coverage(self, tmp_path):
        from oplogtoredis_ray.pipelines.queries import (
            PACK_TOKEN_BUDGET,
            q_pack_sequences,
        )

        sf = self._docs_table(tmp_path)
        out = q_pack_sequences(sf).to_pandas()
        # every doc packed exactly once
        assert int(out["n_docs"].sum()) == 120
        # floor binning invariant: a sequence's PREDECESSOR tokens fit its
        # index window, so tokens-before-start < budget * (seq_idx + 1)
        for (_, seqs) in out.groupby("bucket"):
            seqs = seqs.sort_values("seq_idx")
            cum = 0
            for _, r in seqs.iterrows():
                assert cum // PACK_TOKEN_BUDGET == r["seq_idx"]
                cum += r["seq_tokens"]
        # id spans within a bucket are disjoint and ordered
        for (_, seqs) in out.groupby("bucket"):
            seqs = seqs.sort_values("seq_idx")
            assert (seqs["first_doc"] <= seqs["last_doc"]).all()
            assert (
                seqs["first_doc"].iloc[1:].values > seqs["last_doc"].iloc[:-1].values
            ).all()

    def test_stratified_sample_rates_and_determinism(self, tmp_path):
        from oplogtoredis_ray.pipelines.queries import (
            STRATA_DEFAULT_RATE,
            STRATA_RATES,
            q_stratified_sample,
        )

        sf = self._docs_table(tmp_path)
        out1 = q_stratified_sample(sf).to_pandas().sort_values("doc_id")
        out2 = q_stratified_sample(sf).to_pandas().sort_values("doc_id")
        pd.testing.assert_frame_equal(
            out1.reset_index(drop=True), out2.reset_index(drop=True)
        )  # pure function of (doc_id, lang)
        # full-rate strata keep everything; others are strict subsets
        kept = out1.groupby("lang")["doc_id"].count()
        assert kept.get("de", 0) == 17 and kept.get("fr", 0) == 17
        assert 0 < kept.get("en", 0) < 52  # ~50% of 52 en docs
        assert kept.get("xx", 0) <= 17 * STRATA_DEFAULT_RATE // 100 + 3
        assert STRATA_RATES["de"] == 1000
