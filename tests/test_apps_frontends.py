"""Tests for the L6 frontend/aux components: hub zoo, web UI, realtime CLI,
eval metrics, baseline adapters (reference equivalents: hf_utils.py, app*.py,
real-time-gui.py, eval.py, baselines/*)."""

import io
import json
import os
import threading
import urllib.request
import uuid

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# hub
# ---------------------------------------------------------------------------

def test_zoo_presets_reference_known_artifacts():
    from seedvc_tpu.core.hub import MODEL_ZOO, PRESET_ARTIFACTS

    for preset, names in PRESET_ARTIFACTS.items():
        for name in names:
            assert name in MODEL_ZOO, (preset, name)
    # coordinates of the flagship checkpoint (reference inference.py:49-52)
    art = MODEL_ZOO["dit_whisper_small_wavenet"]
    assert art.repo_id == "Plachta/Seed-VC"
    assert art.filename.endswith(".pth")
    assert art.config_filename.endswith(".yml")


def test_hub_local_path_short_circuits_network(tmp_path):
    from seedvc_tpu.core.hub import load_custom_model_from_hf

    (tmp_path / "rmvpe.pt").write_bytes(b"x")
    path = load_custom_model_from_hf("lj1995/VoiceConversionWebUI",
                                     "rmvpe.pt", cache_dir=str(tmp_path))
    assert path == str(tmp_path / "rmvpe.pt")


def test_hub_nested_filename_and_config(tmp_path):
    from seedvc_tpu.core.hub import load_custom_model_from_hf

    # flat layout by basename (manually dropped file)
    (tmp_path / "cfm_small.pth").write_bytes(b"x")
    (tmp_path / "config.yml").write_bytes(b"y")
    m, c = load_custom_model_from_hf("Plachta/Seed-VC", "v2/cfm_small.pth",
                                     "config.yml", cache_dir=str(tmp_path))
    assert m.endswith("cfm_small.pth") and c.endswith("config.yml")


def test_hub_unknown_artifact_raises():
    from seedvc_tpu.core.hub import fetch

    with pytest.raises(KeyError):
        fetch("nonexistent_model")


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------

def test_edit_distance_known_values():
    from seedvc_tpu.apps.metrics import edit_distance

    assert edit_distance([], []) == 0
    assert edit_distance(list("kitten"), list("sitting")) == 3
    assert edit_distance("a b c".split(), "a c".split()) == 1


def test_wer_cer():
    from seedvc_tpu.apps.metrics import cer, wer

    assert wer("the cat sat", "the cat sat") == 0.0
    assert wer("the cat sat", "the bat sat") == pytest.approx(1 / 3)
    # punctuation/case-insensitive
    assert wer("Hello, world!", "hello world") == 0.0
    assert cer("abc", "abd") == pytest.approx(1 / 3)
    assert wer("", "something") == 1.0  # hyp insertions vs empty ref


# ---------------------------------------------------------------------------
# baselines
# ---------------------------------------------------------------------------

def test_command_baseline_template_validation():
    from seedvc_tpu.apps.baselines import CommandBaseline, get_baseline

    with pytest.raises(ValueError):
        CommandBaseline("echo {source} {reference}")  # missing {output}
    with pytest.raises(KeyError):
        get_baseline("no_such")


def test_command_baseline_runs(tmp_path):
    from seedvc_tpu.apps.baselines import CommandBaseline

    src = tmp_path / "s.wav"
    ref = tmp_path / "r.wav"
    out = tmp_path / "o.wav"
    src.write_bytes(b"AUDIO")
    ref.write_bytes(b"REF")
    bl = CommandBaseline("cp {source} {output} && test -f {reference}")
    bl.convert(str(src), str(ref), str(out))
    assert out.read_bytes() == b"AUDIO"


# ---------------------------------------------------------------------------
# realtime CLI
# ---------------------------------------------------------------------------

def test_realtime_settings_roundtrip(tmp_path):
    from seedvc_tpu.apps.realtime import load_settings, save_settings

    path = str(tmp_path / "cfg" / "realtime.json")
    save_settings({"block_time": 0.3, "diffusion_steps": 8,
                   "not_a_setting": 1}, path)
    loaded = load_settings(path)
    assert loaded == {"block_time": 0.3, "diffusion_steps": 8}


def test_realtime_simulated_run(tmp_path):
    """File-driven streaming with a stub streamer: block framing, pacing off,
    output writing, and the latency report."""
    import types

    from seedvc_tpu.apps import realtime

    class StubStreamer:
        sr = 22050
        block = 2205
        extra_right = 441

        def process_block(self, block):
            assert len(block) == self.block
            return -block

    out_path = str(tmp_path / "out.wav")
    in_path = str(tmp_path / "in.wav")
    from seedvc_tpu.apps.audio_io import save_wav

    save_wav(in_path, np.sin(np.linspace(0, 100, 22050)).astype(np.float32),
             22050)
    args = types.SimpleNamespace(simulate=in_path, output=out_path,
                                 realtime_pace=False)
    realtime.run_simulated(StubStreamer(), args)
    assert os.path.exists(out_path)


def test_realtime_algorithmic_delay_formula():
    import types

    from seedvc_tpu.apps.realtime import algorithmic_delay_ms

    s = types.SimpleNamespace(sr=22050, block=2205, extra_right=441)
    # block*2 + extra_right (reference README.md:156)
    assert algorithmic_delay_ms(s) == pytest.approx(
        1000 * (2 * 2205 + 441) / 22050)


# ---------------------------------------------------------------------------
# web UI
# ---------------------------------------------------------------------------

def _multipart(fields: dict) -> tuple[bytes, str]:
    boundary = uuid.uuid4().hex
    buf = io.BytesIO()
    for name, value in fields.items():
        buf.write(f"--{boundary}\r\n".encode())
        if isinstance(value, tuple):
            filename, data = value
            buf.write(f'Content-Disposition: form-data; name="{name}"; '
                      f'filename="{filename}"\r\n'
                      f"Content-Type: audio/wav\r\n\r\n".encode())
            buf.write(data)
        else:
            buf.write(f'Content-Disposition: form-data; name="{name}"'
                      f"\r\n\r\n".encode())
            buf.write(str(value).encode())
        buf.write(b"\r\n")
    buf.write(f"--{boundary}--\r\n".encode())
    return buf.getvalue(), f"multipart/form-data; boundary={boundary}"


def _wav_bytes(n=4410, sr=22050) -> bytes:
    from scipy.io import wavfile

    buf = io.BytesIO()
    wave = (np.sin(np.linspace(0, 50, n)) * 20000).astype(np.int16)
    wavfile.write(buf, sr, wave)
    return buf.getvalue()


def test_parse_multipart_roundtrip():
    from seedvc_tpu.apps.webui import parse_multipart

    body, ctype = _multipart({"mode": "vc",
                              "source": ("s.wav", b"\x00\x01BIN")})
    fields = parse_multipart(ctype, body)
    assert fields["mode"][1] == b"vc"
    assert fields["source"][0] == "s.wav"
    assert fields["source"][1] == b"\x00\x01BIN"


class FakeConverter:
    """Stands in for VoiceConverter: echoes an attenuated source."""

    calls: list = []

    def convert(self, src, src_sr, ref, ref_sr, **kw):
        FakeConverter.calls.append(kw)
        return src_sr, 0.5 * src, {"rtf": 0.123}


@pytest.fixture()
def webui_server():
    from seedvc_tpu.apps.webui import ConverterRegistry, make_server

    registry = ConverterRegistry()
    registry._cache["v1:whisper_small_wavenet"] = FakeConverter()
    registry._cache["v1:whisper_base_f0_44k"] = FakeConverter()
    server = make_server("127.0.0.1", 0, registry)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def test_webui_index_and_status(webui_server):
    html = urllib.request.urlopen(webui_server + "/").read().decode()
    assert "seedvc_tpu" in html and "Convert" in html
    status = json.loads(
        urllib.request.urlopen(webui_server + "/api/status").read())
    assert "v1:whisper_small_wavenet" in status["loaded"]


def test_webui_convert_roundtrip(webui_server):
    FakeConverter.calls.clear()
    body, ctype = _multipart({
        "mode": "vc",
        "diffusion_steps": 7,
        "cfg_rate": 0.5,
        "source": ("s.wav", _wav_bytes()),
        "target": ("r.wav", _wav_bytes()),
    })
    req = urllib.request.Request(webui_server + "/api/convert", data=body,
                                 headers={"Content-Type": ctype})
    resp = urllib.request.urlopen(req)
    assert resp.headers["X-RTF"] == "0.1230"
    from scipy.io import wavfile

    sr, wave = wavfile.read(io.BytesIO(resp.read()))
    assert sr == 22050 and len(wave) == 4410
    assert FakeConverter.calls[0]["diffusion_steps"] == 7
    assert FakeConverter.calls[0]["cfg_rate"] == 0.5


def test_webui_svc_mode_uses_f0_preset_and_knobs(webui_server):
    FakeConverter.calls.clear()
    body, ctype = _multipart({
        "mode": "svc",
        "pitch_shift": -2,
        "auto_f0_adjust": "on",
        "source": ("s.wav", _wav_bytes()),
        "target": ("r.wav", _wav_bytes()),
    })
    req = urllib.request.Request(webui_server + "/api/convert", data=body,
                                 headers={"Content-Type": ctype})
    urllib.request.urlopen(req)
    assert FakeConverter.calls[0]["pitch_shift"] == -2.0
    assert FakeConverter.calls[0]["auto_f0_adjust"] is True


def test_webui_missing_upload_is_400(webui_server):
    body, ctype = _multipart({"mode": "vc"})
    req = urllib.request.Request(webui_server + "/api/convert", data=body,
                                 headers={"Content-Type": ctype})
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req)
    assert exc.value.code == 400


def test_f0_metrics():
    from seedvc_tpu.apps.metrics import f0_metrics

    f0 = 220.0 * np.ones(100)
    f0[:10] = 0.0  # unvoiced head
    same = f0_metrics(f0, f0)
    assert same["f0_rmse_cents"] == 0.0
    assert same["voiced_frames"] == 90

    # one semitone sharp everywhere -> 100 cents RMSE, corr undefined-ish
    shifted = f0 * 2 ** (1 / 12)
    m = f0_metrics(f0, shifted)
    assert m["f0_rmse_cents"] == pytest.approx(100.0, abs=1e-6)

    # correlated contour
    t = np.linspace(0, 1, 200)
    a = 200 + 50 * np.sin(2 * np.pi * 3 * t)
    b = a * 1.01
    assert f0_metrics(a, b)["f0_corr"] > 0.999
    # all-unvoiced -> NaN, no crash
    assert np.isnan(f0_metrics(np.zeros(5), np.zeros(5))["f0_corr"])
