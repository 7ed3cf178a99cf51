"""Streaming pipeline + native SOLA tests."""

import numpy as np
import pytest

from seedvc_tpu.dsp.sola import (
    crossfade_add, fade_windows, ring_shift_append, sola_offset, _load_native)


def test_native_lib_builds():
    assert _load_native() is not None, "native C++ SOLA library failed to build"


def test_sola_offset_native_matches_numpy():
    rng = np.random.default_rng(0)
    chunk = rng.standard_normal(2000).astype(np.float32)
    buf = chunk[137:137 + 800].copy()  # exact match at offset 137
    k_native = sola_offset(chunk, buf, 400, use_native=True)
    k_numpy = sola_offset(chunk, buf, 400, use_native=False)
    assert k_native == k_numpy == 137


def test_crossfade_add_native_matches_numpy():
    rng = np.random.default_rng(1)
    chunk = rng.standard_normal(500).astype(np.float32)
    tail = rng.standard_normal(100).astype(np.float32)
    a = crossfade_add(chunk.copy(), tail, use_native=True)
    b = crossfade_add(chunk.copy(), tail, use_native=False)
    np.testing.assert_allclose(a, b, atol=1e-6)
    fade_in, fade_out = fade_windows(100)
    assert fade_in[0] == 0.0 and abs(fade_in[-1] - 1.0) < 1e-6


def test_ring_shift_append_native_matches_numpy():
    ring = np.arange(10, dtype=np.float32)
    block = np.array([100.0, 101.0, 102.0], np.float32)
    a = ring_shift_append(ring.copy(), block, use_native=True)
    b = ring_shift_append(ring.copy(), block, use_native=False)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a[-3:], block)
    np.testing.assert_array_equal(a[:7], np.arange(3, 10))


@pytest.mark.slow
def test_streaming_converter_blocks():
    from tests_helpers_tiny import tiny_converter

    conv = tiny_converter()
    from seedvc_tpu.pipelines.streaming import StreamConfig, StreamingConverter

    scfg = StreamConfig(block_time=0.1, crossfade_time=0.02,
                        sola_search_time=0.01, extra_time_ce=0.3,
                        extra_time_dit=0.2, extra_time_right=0.02,
                        diffusion_steps=2, max_prompt_time=0.5)
    stream = StreamingConverter(conv, scfg)
    rng = np.random.default_rng(0)
    ref = (rng.standard_normal(22050) * 0.1).astype(np.float32)
    stream.set_reference(ref, 22050)

    outs = []
    for i in range(3):
        block = (rng.standard_normal(stream.block) * 0.1).astype(np.float32)
        out = stream.process_block(block)
        assert out.shape == (stream.block,)
        assert np.isfinite(out).all()
        outs.append(out)
    assert len(np.concatenate(outs)) == 3 * stream.block


@pytest.mark.slow
def test_streaming_warm_start_zero_compiles():
    """``set_reference`` compiles AND warms both block programs (VERDICT r4
    next #3): the first ``process_block`` must trigger ZERO new XLA
    compiles — the reference's eager realtime path has no first-block
    stall (``real-time-gui.py:994``), so neither may this one."""
    import numpy as np

    from tests_helpers_tiny import tiny_converter
    from seedvc_tpu.pipelines.streaming import StreamConfig, StreamingConverter

    conv = tiny_converter()
    scfg = StreamConfig(block_time=0.1, crossfade_time=0.02,
                        sola_search_time=0.01, extra_time_ce=0.3,
                        extra_time_dit=0.2, extra_time_right=0.02,
                        diffusion_steps=2, max_prompt_time=0.5,
                        vad_threshold_db=-10000.0)
    stream = StreamingConverter(conv, scfg)
    rng = np.random.default_rng(0)
    stream.set_reference(
        (rng.standard_normal(22050) * 0.1).astype(np.float32), 22050)

    sizes = (stream._fused._cache_size(), stream._shift_fn._cache_size())
    assert sizes == (1, 1), "set_reference did not pre-compile the programs"
    for _ in range(2):
        out = stream.process_block(
            (rng.standard_normal(stream.block) * 0.1).astype(np.float32))
        assert np.isfinite(out).all()
    assert (stream._fused._cache_size(),
            stream._shift_fn._cache_size()) == sizes, \
        "first process_block compiled a new program variant"
