"""Native (C++) repack engine vs the numpy reference path."""
import numpy as np
import pytest

import conftest  # noqa: F401

from chatllm_tpu.ggmm.quants import GGMLType, quantize
from chatllm_tpu.native import get_lib, native_repack
from chatllm_tpu.ops.qtensor import pack_nibbles, repack_quantized


@pytest.mark.skipif(get_lib() is None, reason="no C++ toolchain")
@pytest.mark.parametrize("t,out_d,in_d", [
    (GGMLType.Q4_K, 48, 512),
    (GGMLType.Q4_0, 48, 256),
    (GGMLType.Q8_0, 48, 256),
])
def test_native_repack_matches_numpy(t, out_d, in_d):
    rng = np.random.default_rng(3)
    w = rng.standard_normal((out_d, in_d)).astype(np.float32) * 0.1
    raw = np.frombuffer(quantize(w, t), np.uint8)

    nat = native_repack(raw, int(t), (out_d, in_d))
    assert nat is not None
    qn, sn, bn, G, packed, zero = nat

    q, s, b, G2 = repack_quantized(raw, t, (out_d, in_d))
    assert G == G2
    np.testing.assert_allclose(sn, s, rtol=1e-6, atol=1e-7)
    if b is None:
        assert bn is None
    else:
        np.testing.assert_allclose(bn, b, rtol=1e-6, atol=1e-6)
    if packed:
        qp, zero2 = pack_nibbles(q, G)
        assert zero == zero2
        np.testing.assert_array_equal(qn, qp)
    else:
        np.testing.assert_array_equal(qn, q)
