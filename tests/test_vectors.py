"""VectorisedGraph semantic search + NodeState.arrow_compute."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _gf(ray_session):
    import ray.data as rd
    from raphtory_ray.graph.graph_frame import GraphFrame
    edges = pa.table({
        "src": pa.array([0, 1, 2], pa.int64()),
        "dst": pa.array([1, 2, 0], pa.int64()),
        "t": pa.array([1, 2, 3], pa.int64()),
        "event_id": pa.array([0, 1, 2], pa.int64())})
    verts = pa.table({
        "vid": pa.array([0, 1, 2], pa.int64()),
        "gid": pa.array(["alpha server", "beta cache", "gamma server"],
                        pa.string())})
    return GraphFrame(rd.from_arrow(edges), 3, verts)


def test_nodes_by_similarity(ray_session):
    from raphtory_ray.data.vectors import vectorise
    vg = vectorise(_gf(ray_session))
    top = vg.nodes_by_similarity("server", 2)
    # the two 'server' nodes outrank the 'cache' node
    assert set(top["vec_id"].to_pylist()) == {0, 2}
    assert top["rank"].to_pylist() == [1, 2]
    # exact query by embedding vector works too
    from raphtory_ray.data.vectors import default_embedding
    v = default_embedding(["node alpha server"])[0]
    top2 = vg.nodes_by_similarity(list(v), 1)
    assert top2["vec_id"].to_pylist() == [0]


def test_edges_and_entities(ray_session):
    from raphtory_ray.data.vectors import vectorise
    vg = vectorise(_gf(ray_session))
    e = vg.edges_by_similarity("alpha", 3)
    assert e.num_rows == 3
    ents = vg.entities_by_similarity("server", 4)
    assert ents.num_rows == 4
    assert set(ents["kind"].to_pylist()) == {"node", "edge"}
    assert ents["rank"].to_pylist() == [1, 2, 3, 4]


def test_nodestate_arrow_compute(ray_session):
    import pyarrow.compute as pc
    from raphtory_ray.graph.node_state import NodeState
    ns = NodeState(np.array([1.0, 4.0, 9.0]), name="v")
    out = ns.arrow_compute(pc.sqrt)
    assert out.values.tolist() == [1.0, 2.0, 3.0]
    assert out.name == "v"


def _ppm_bytes(img):
    import numpy as np
    h, w, _ = img.shape
    return (b"P6\n# test\n%d %d\n255\n" % (w, h)) + img.astype("uint8").tobytes()


def _wav_bytes(samples_i16, rate=8000, channels=1):
    import numpy as np
    data = samples_i16.astype("<i2").tobytes()
    fmt = (1).to_bytes(2, "little") + channels.to_bytes(2, "little") + \
        rate.to_bytes(4, "little") + \
        (rate * channels * 2).to_bytes(4, "little") + \
        (channels * 2).to_bytes(2, "little") + (16).to_bytes(2, "little")
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt + \
        b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def test_real_ppm_decode(ray_session):
    """fake=False is a REAL decode for PPM payloads (pure-numpy parser)."""
    import numpy as np
    import pyarrow as pa
    from raphtory_ray.data.multimodal import DecodeImageStage, decode_ppm
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (8, 6, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(_ppm_bytes(img)), img)
    batch = pa.table({"item_id": pa.array([0], pa.int64()),
                      "image": pa.array([_ppm_bytes(img)], pa.binary())})
    out = DecodeImageStage(height=8, width=6, fake=False)(batch)
    pix = np.asarray(out["pixels"].combine_chunks().values).reshape(8, 6, 3)
    assert np.array_equal(pix, img)       # same size → identity resize


def test_real_wav_decode(ray_session):
    import numpy as np
    import pyarrow as pa
    from raphtory_ray.data.multimodal import (DecodeAudioStage,
                                              decode_wav_pcm16)
    sig = (np.sin(np.linspace(0, 20, 400)) * 20000).astype(np.int16)
    samples, rate = decode_wav_pcm16(_wav_bytes(sig, rate=8000))
    assert rate == 8000 and len(samples) == 400
    assert np.allclose(samples, sig / 32768.0, atol=1e-6)
    # stereo averages to mono
    stereo = np.stack([sig, -sig], axis=1).reshape(-1)
    s2, _ = decode_wav_pcm16(_wav_bytes(stereo, rate=8000, channels=2))
    assert np.allclose(s2, 0.0, atol=1e-4)
    batch = pa.table({"item_id": pa.array([0], pa.int64()),
                      "audio": pa.array([_wav_bytes(sig)], pa.binary())})
    out = DecodeAudioStage(fake=False)(batch)
    assert out["duration_s"].to_pylist() == [400 / 8000]


def test_wav_mixed_sample_rates_in_one_batch(ray_session):
    """durations use each row's native rate, not the last row's (the stage
    must not carry decoded rates as actor state across rows/batches)."""
    import numpy as np
    import pyarrow as pa
    from raphtory_ray.data.multimodal import DecodeAudioStage
    sig16 = (np.sin(np.linspace(0, 20, 1600)) * 20000).astype(np.int16)
    sig8 = (np.sin(np.linspace(0, 20, 400)) * 20000).astype(np.int16)
    batch = pa.table({
        "item_id": pa.array([0, 1], pa.int64()),
        "audio": pa.array([_wav_bytes(sig16, rate=16000),
                           _wav_bytes(sig8, rate=8000)], pa.binary())})
    st = DecodeAudioStage(fake=False)
    out = st(batch)
    assert out["duration_s"].to_pylist() == [1600 / 16000, 400 / 8000]
    # and a following fake batch still uses the configured rate
    st2 = DecodeAudioStage(fake=True, sample_rate=16000)
    fake_batch = pa.table({"item_id": pa.array([0], pa.int64()),
                           "audio": pa.array([b"xyz"], pa.binary())})
    o2 = st2(fake_batch)
    n = len(o2["samples"][0])
    assert abs(o2["duration_s"][0].as_py() - n / 16000) < 1e-9
