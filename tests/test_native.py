"""C++ native data path: build, parity with python fallbacks."""
import numpy as np
import pytest

from mgvae_tpu import native
from mgvae_tpu.data.synthetic import random_circuit


def _have_native():
    return native.get_lib() is not None


@pytest.mark.skipif(not _have_native(), reason="native lib unavailable")
def test_native_levelize_matches_python():
    import mgvae_tpu.data.levelize as lv

    rng = np.random.default_rng(0)
    for _ in range(5):
        g = random_circuit(rng, "xmg", num_inputs=6, num_gates=80)
        a = native.levelize_native(g.edge_index, g.num_nodes)
        # force the python path by calling the inner implementation directly
        import os

        os.environ["MGVAE_NO_NATIVE"] = "1"
        native._lib = None
        b = lv.levelize(g.edge_index, g.num_nodes)
        del os.environ["MGVAE_NO_NATIVE"]
        native._lib = None
        np.testing.assert_array_equal(a, b)


@pytest.mark.skipif(not _have_native(), reason="native lib unavailable")
def test_native_levelize_cycle():
    edge = np.array([[0, 1, 2], [1, 2, 0]])
    with pytest.raises(ValueError):
        native.levelize_native(edge, 3)


@pytest.mark.skipif(not _have_native(), reason="native lib unavailable")
def test_native_aig_decode_matches_python(tmp_path):
    def enc(x):
        out = b""
        while x >= 0x80:
            out += bytes([(x & 0x7F) | 0x80])
            x >>= 7
        return out + bytes([x])

    ands = [(6, 4, 2), (8, 5, 3), (10, 9, 7)]
    blob = b"aig 5 2 0 1 3\n10\n"
    for lhs, r0, r1 in ands:
        blob += enc(lhs - r0) + enc(r0 - r1)

    res = native.aig_decode_native(blob)
    assert res is not None
    gates, edges = res

    # python reference decode
    from mgvae_tpu.data.aiger import _decode_binary

    i, l, o, a, outputs, pands = _decode_binary(blob)
    assert pands == ands
    # structural expectations (see tests/test_parsers.py)
    assert len(gates) == 9
    assert (gates == 2).sum() == 4 and (gates == 1).sum() == 3
    assert edges.shape[1] == 2 * 3 + 4  # 2 per AND + 1 per NOT


def test_native_collate_matches_numpy(monkeypatch):
    """The C++ collate core must produce byte-identical batches to the numpy
    reference path, across modalities, paddings, and tt-pair layouts."""
    import mgvae_tpu.data.batching as B
    from mgvae_tpu.data.synthetic import random_circuit
    from mgvae_tpu.native import get_lib

    if get_lib() is None:
        import pytest

        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(7)
    for modality, ng, nc in (("mig", 40, 5), ("xmg", 300, 3), ("aig", 24, 1)):
        graphs = [
            random_circuit(rng, modality, num_inputs=6, num_gates=ng, num_tt_pairs=16)
            for _ in range(nc)
        ]
        b_nat = B.collate(graphs, mp=2)
        with monkeypatch.context() as m:
            m.setattr(B, "_collate_native", lambda *a, **k: None)
            b_np = B.collate(graphs, mp=2)
        assert set(b_nat) == set(b_np)
        for k in b_np:
            np.testing.assert_array_equal(
                np.asarray(b_nat[k]), np.asarray(b_np[k]), err_msg=f"{modality}:{k}"
            )
