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


def test_webui_registry_warm_builds_and_warms(monkeypatch):
    """--warm startup path: the registry builds each requested mode's
    converter and forwards the (source_s, ref_s) specs to its warm()."""
    from seedvc_tpu.apps.webui import ConverterRegistry

    calls = []

    class StubConv:
        def __init__(self, key):
            self.key = key

        def warm(self, specs):
            calls.append((self.key, list(specs)))

    reg = ConverterRegistry()
    monkeypatch.setattr(reg, "get",
                        lambda mode, preset: StubConv(f"{mode}:{preset}"))
    specs = [(30.0, 5.0), (10.0, 5.0)]
    reg.warm(specs, modes=("vc", "svc", "v2"))
    assert [c[0] for c in calls] == [
        "vc:whisper_small_wavenet", "svc:whisper_base_f0_44k", "v2:v2"]
    assert all(c[1] == specs for c in calls)


# ---------------------------------------------------------------------------
# eval harness end-to-end
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_eval_main_end_to_end(tmp_path, monkeypatch):
    """Runs ``apps/eval.py`` main() FOR REAL (VERDICT r3 next #4): synthetic
    utterances through the actual conversion+scoring loop with a tiny
    converter, stubbed ASR/DNSMOS adapters exercising the WER/CER and MOS
    plumbing, and the cache/resume behaviour of converted wavs
    (reference ``eval.py:361-368``)."""
    import seedvc_tpu.apps.metrics as metrics_mod
    import seedvc_tpu.pipelines.convert as convert_mod
    from seedvc_tpu.apps import eval as eval_app
    from seedvc_tpu.apps.audio_io import save_wav
    from tests_helpers_tiny import tiny_converter

    sr = 22050
    rng = np.random.default_rng(0)
    src_dir, tgt_dir, out_dir = (tmp_path / "src", tmp_path / "tgt",
                                 tmp_path / "out")
    src_dir.mkdir()
    tgt_dir.mkdir()

    def tone(f0, secs=1.2, seed=0):
        t = np.arange(int(secs * sr)) / sr
        x = sum((0.3 / h) * np.sin(2 * np.pi * f0 * h * t) for h in (1, 2))
        return (x + 0.01 * np.random.default_rng(seed)
                .standard_normal(len(t))).astype(np.float32)

    for i in range(2):
        save_wav(str(src_dir / f"s{i}.wav"), tone(140 + 40 * i, seed=i), sr)
    save_wav(str(tgt_dir / "ref0.wav"), tone(220, secs=0.8, seed=9), sr)
    (tmp_path / "index.tsv").write_text("s0\thello world\ns1\tthe cat sat\n")

    vc = tiny_converter()
    calls = {"convert": 0}
    orig_convert = vc.convert

    def counting_convert(*a, **kw):
        calls["convert"] += 1
        return orig_convert(*a, **kw)

    vc.convert = counting_convert
    monkeypatch.setattr(convert_mod, "VoiceConverter",
                        lambda cfg, **params: vc)

    class StubASR:
        def __init__(self, model_dir):
            assert model_dir == "stub-asr"

        def transcribe(self, wave_16k):
            return "hello world"

    class StubDNSMOS:
        def __init__(self, model_dir):
            assert model_dir == "stub-dnsmos"

        def score(self, wave_16k):
            return {"sig": 3.4, "bak": 3.9, "ovrl": 3.1, "p808": 3.5}

    monkeypatch.setattr(metrics_mod, "CTCTranscriber", StubASR)
    monkeypatch.setattr(metrics_mod, "DNSMOS", StubDNSMOS)

    argv = ["--source-dir", str(src_dir), "--target-dir", str(tgt_dir),
            "--output", str(out_dir), "--diffusion-steps", "2",
            "--asr-model", "stub-asr", "--dnsmos-dir", "stub-dnsmos",
            "--transcripts", str(tmp_path / "index.tsv")]
    eval_app.main(argv)

    assert calls["convert"] == 2  # 2 sources x 1 reference voice
    with open(out_dir / "results.json") as f:
        report = json.load(f)
    assert report["summary"]["n"] == 2
    for key in ("mean_secs", "mean_wer", "mean_cer", "mean_dnsmos_sig",
                "mean_dnsmos_ovrl", "mean_dnsmos_p808"):
        assert key in report["summary"], key
    # s0's transcript matches the stub ASR exactly -> one perfect WER row
    wers = sorted(r["wer"] for r in report["results"])
    assert wers[0] == 0.0 and wers[1] > 0.0
    assert -1.0 <= report["summary"]["mean_secs"] <= 1.0
    # converted wavs are cached for resume
    assert sorted(p.name for p in out_dir.glob("*.wav")) == [
        "ref0_s0.wav", "ref0_s1.wav"]

    # second run resumes from the cached wavs: no new conversions
    eval_app.main(argv)
    assert calls["convert"] == 2
    with open(out_dir / "results.json") as f:
        assert json.load(f)["summary"]["n"] == 2


# ---------------------------------------------------------------------------
# realtime CLI
# ---------------------------------------------------------------------------

def test_infer_cli_svc_flags_plumb_through(tmp_path, monkeypatch):
    """--f0-condition switches to the F0 preset and --auto-f0-adjust /
    --semi-tone-shift reach convert() (reference inference.py:546-548)."""
    import numpy as np

    from seedvc_tpu.apps import infer
    from seedvc_tpu.apps.audio_io import save_wav
    import seedvc_tpu.pipelines.convert as convert_mod

    seen = {}

    class StubConverter:
        def __init__(self, cfg, **kw):
            seen["sr"] = cfg.preprocess_params.sr

        def convert(self, src, src_sr, ref, ref_sr, **kw):
            seen.update(kw)
            return 44100, np.zeros(100, np.float32), {
                "rtf": 0.0, "audio_seconds": 0.0, "wall_seconds": 0.0,
                "chunks": 1, "stages": {}}

    monkeypatch.setattr(convert_mod, "VoiceConverter", StubConverter)
    wav = np.zeros(4000, np.float32)
    src, ref = str(tmp_path / "s.wav"), str(tmp_path / "r.wav")
    save_wav(src, wav, 16000)
    save_wav(ref, wav, 16000)
    infer.main(["--source", src, "--target", ref,
                "--output", str(tmp_path / "out"),
                "--f0-condition", "true", "--auto-f0-adjust", "true",
                "--semi-tone-shift", "2.0"])
    assert seen["sr"] == 44100  # whisper_base_f0_44k preset selected
    assert seen["auto_f0_adjust"] is True
    assert seen["pitch_shift"] == 2.0


def test_train_cli_pretrained_and_validation_plumb_through(tmp_path,
                                                           monkeypatch):
    """--checkpoint-dir loads converted trees into Trainer kwargs (the
    reference --pretrained-ckpt analogue) and --val-dataset-dir /
    --validation-interval / --patience reach TrainerConfig/train()."""
    import pickle

    from seedvc_tpu.apps import train as train_app
    import seedvc_tpu.train.trainer as trainer_mod
    import seedvc_tpu.train.dataset as dataset_mod

    seen = {}

    class StubTrainer:
        def __init__(self, cfg, tcfg, n_model=1, **kw):
            seen["tcfg"] = tcfg
            seen["params"] = kw

        def restore_latest(self):
            return False

        def train(self, dataset, val_dataset=None):
            seen["val_dataset"] = val_dataset
            return 0

        def export_serving(self, out_dir=None, use_ema=True):
            seen["export_dir"] = out_dir
            return "vc.pkl"

    class StubDataset:
        def __init__(self, path, sr, batch_size):
            self.path = path

    monkeypatch.setattr(trainer_mod, "Trainer", StubTrainer)
    monkeypatch.setattr(dataset_mod, "FTDataset", StubDataset)
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    with open(ckpt / "vc.pkl", "wb") as f:
        pickle.dump({"w": 1}, f)
    train_app.main(["--dataset-dir", str(tmp_path),
                    "--val-dataset-dir", str(tmp_path),
                    "--validation-interval", "50", "--patience", "3",
                    "--checkpoint-dir", str(ckpt), "--max-steps", "1"])
    assert seen["tcfg"].validation_interval == 50
    assert seen["tcfg"].early_stop_patience == 3
    assert seen["params"] == {"vc_params": {"w": 1}}
    assert isinstance(seen["val_dataset"], StubDataset)


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

    sr = 22050

    def convert_with_streaming(self, src, src_sr, ref, ref_sr, **kw):
        FakeConverter.calls.append(kw)
        if len(src) < 3:  # sub-chunk-length source: zero pieces
            return
        n = len(src) // 3
        for i in range(3):
            yield src_sr, 0.5 * src[i * n: (i + 1) * n], {"rtf": 0.1}


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


def test_p808_melspec_matches_torch_stft():
    """The P.808 DNSMOS mel frontend (numpy) matches a torch.stft reference
    with torchaudio's exact settings (n_fft=321, hop=160, center/reflect,
    slaney mel scale without norm, power_to_db ref=max, +40/40)."""
    import numpy as np
    import torch

    from seedvc_tpu.apps.metrics import p808_melspec
    from seedvc_tpu.dsp.mel import mel_filterbank

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)

    spec = torch.stft(
        torch.from_numpy(audio), n_fft=321, hop_length=160, win_length=321,
        window=torch.hann_window(321, periodic=True), center=True,
        pad_mode="reflect", return_complex=True)
    power = (spec.abs() ** 2).numpy()  # (161, T)
    fb = mel_filterbank(16000, 321, 120, fmin=0.0, fmax=8000.0, norm=None)
    mel = (fb @ power).T  # (T, 120)
    db = 10 * np.log10(np.maximum(mel, 1e-10))
    db = db - 10 * np.log10(np.maximum(mel.max(), 1e-10))
    db = np.maximum(db, db.max() - 80.0)
    ref = (db + 40.0) / 40.0

    ours = p808_melspec(audio)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_builtin_presets_include_cantonese():
    """All 5 reference YAML presets have built-in equivalents
    (configs/presets/config_cantonese*.yml differ only in the whisper name)."""
    from seedvc_tpu.core.config import get_preset

    cfg = get_preset("cantonese_whisper_small_wavenet")
    base = get_preset("whisper_small_wavenet")
    assert (cfg.model_params.speech_tokenizer.name
            == "alvanlii/whisper-small-cantonese")
    assert cfg.model_params.DiT == base.model_params.DiT

    cfg44 = get_preset("cantonese_whisper_base_f0_44k")
    assert cfg44.preprocess_params.sr == 44100
    assert (cfg44.model_params.speech_tokenizer.name
            == "alvanlii/whisper-small-cantonese")


def test_cosyvoice_baseline_gated():
    """Without a ../CosyVoice checkout the adapter raises a clear error
    (reference baselines/cosyvoice.py:5-13 sibling-checkout pattern)."""
    import pytest

    from seedvc_tpu.apps.baselines import get_baseline

    with pytest.raises(RuntimeError, match="CosyVoice"):
        get_baseline("cosyvoice", repo_dir="/nonexistent/CosyVoice")


def test_webui_examples_rows(webui_server):
    """Example rows (reference app.py:158-165): listed via /api/examples and
    each URL serves a readable wav."""
    rows = json.loads(
        urllib.request.urlopen(webui_server + "/api/examples").read())
    assert len(rows) >= 2
    slots = {r["slot"] for r in rows}
    assert slots == {"source", "target"}
    from scipy.io import wavfile

    data = urllib.request.urlopen(webui_server + rows[0]["url"]).read()
    sr, wave = wavfile.read(io.BytesIO(data))
    assert sr == 22050 and len(wave) > 1000


def test_webui_convert_stream_chunked(webui_server):
    """/api/convert_stream sends chunked transfer-encoding with one chunk
    per pipeline piece (reference app.py:167-169 streaming): at least 2
    audio chunks must arrive before EOF, and the reassembled stream is a
    playable wav header + PCM."""
    import http.client
    from urllib.parse import urlparse

    body, ctype = _multipart({
        "mode": "vc",
        "diffusion_steps": 5,
        "source": ("s.wav", _wav_bytes(n=9000)),
        "target": ("r.wav", _wav_bytes()),
    })
    u = urlparse(webui_server)
    conn = http.client.HTTPConnection(u.hostname, u.port)
    conn.request("POST", "/api/convert_stream", body=body,
                 headers={"Content-Type": ctype})
    resp = conn.getresponse()
    assert resp.status == 200
    assert resp.headers.get("Transfer-Encoding") == "chunked"
    assert resp.headers.get("Content-Type") == "audio/wav"
    # http.client decodes chunking; read incrementally to observe >=2 reads
    pieces = []
    while True:
        chunk = resp.read(4096)
        if not chunk:
            break
        pieces.append(chunk)
    data = b"".join(pieces)
    conn.close()
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    # header chunk + 3 generator pieces of 3000 samples each
    assert len(data) == 44 + 2 * 9000


def test_webui_convert_stream_zero_pieces(webui_server):
    """A valid request whose conversion yields no pieces must still return a
    well-formed 200 chunked response containing just the wav header — not
    raw chunk bytes with no status line."""
    import http.client
    from urllib.parse import urlparse

    body, ctype = _multipart({
        "mode": "vc",
        "diffusion_steps": 5,
        "source": ("s.wav", _wav_bytes(n=2)),  # sub-chunk-length source
        "target": ("r.wav", _wav_bytes()),
    })
    u = urlparse(webui_server)
    conn = http.client.HTTPConnection(u.hostname, u.port)
    conn.request("POST", "/api/convert_stream", body=body,
                 headers={"Content-Type": ctype})
    resp = conn.getresponse()
    assert resp.status == 200
    assert resp.headers.get("Transfer-Encoding") == "chunked"
    data = resp.read()
    conn.close()
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    assert len(data) == 44  # header only, no PCM


def test_webui_convert_stream_bad_request_before_headers(webui_server):
    """A request that fails before any chunk is produced gets a clean 400
    (not corrupted chunk framing)."""
    body, ctype = _multipart({"mode": "vc"})  # missing source/target
    import http.client
    from urllib.parse import urlparse

    u = urlparse(webui_server)
    conn = http.client.HTTPConnection(u.hostname, u.port)
    conn.request("POST", "/api/convert_stream", body=body,
                 headers={"Content-Type": ctype})
    resp = conn.getresponse()
    assert resp.status == 400
    assert b"source" in resp.read()
    conn.close()


def _stream_request(webui_server, extra_fields, n=9000):
    import http.client
    from urllib.parse import urlparse

    fields = {
        "mode": "vc",
        "diffusion_steps": 5,
        "source": ("s.wav", _wav_bytes(n=n)),
        "target": ("r.wav", _wav_bytes()),
    }
    fields.update(extra_fields)
    body, ctype = _multipart(fields)
    u = urlparse(webui_server)
    conn = http.client.HTTPConnection(u.hostname, u.port)
    conn.request("POST", "/api/convert_stream", body=body,
                 headers={"Content-Type": ctype})
    return conn, conn.getresponse()


def test_webui_convert_stream_flac(webui_server):
    """stream_format=flac: >=2 compressed chunks arrive and the reassembled
    stream decodes bit-exactly to the wav stream's PCM (the reference
    streams compressed mp3 chunks the same way, app.py:167-169; FLAC is the
    built-in compressed format here — no ffmpeg/lame in this image)."""
    import numpy as np

    from seedvc_tpu.dsp.flac import decode_flac

    conn, resp = _stream_request(webui_server, {"stream_format": "flac"},
                                 n=30000)
    assert resp.status == 200
    assert resp.headers.get("Content-Type") == "audio/flac"
    assert resp.headers.get("Transfer-Encoding") == "chunked"
    reads = []
    while True:
        chunk = resp.read(1024)
        if not chunk:
            break
        reads.append(chunk)
    conn.close()
    assert len(reads) >= 2  # compressed stream arrives incrementally
    blob = b"".join(reads)
    sr, dec = decode_flac(blob)
    assert sr == 22050

    # same request as wav for the PCM ground truth
    conn, resp = _stream_request(webui_server, {"stream_format": "wav"},
                                 n=30000)
    wav = resp.read()
    conn.close()
    pcm_ref = np.frombuffer(wav[44:], "<i2")
    np.testing.assert_array_equal(dec[:, 0], pcm_ref)
    # and it actually compresses vs the raw stream
    assert len(blob) < len(wav) * 0.9


def test_webui_convert_stream_mp3_gated_on_ffmpeg(webui_server):
    """mp3 streaming shells into ffmpeg when present; without it the
    request fails with a clean 400 BEFORE chunked headers (never corrupted
    framing)."""
    import shutil

    conn, resp = _stream_request(webui_server, {"stream_format": "mp3"})
    if shutil.which("ffmpeg") is None:
        assert resp.status == 400
        assert b"ffmpeg" in resp.read()
    else:
        assert resp.status == 200
        assert resp.headers.get("Content-Type") == "audio/mpeg"
        data = resp.read()
        assert len(data) > 0  # mp3 frames (0xFFE sync or ID3)
        assert data[:3] == b"ID3" or data[0] == 0xFF
    conn.close()


def test_webui_convert_stream_unknown_format_is_400(webui_server):
    conn, resp = _stream_request(webui_server, {"stream_format": "ogg"})
    assert resp.status == 400
    assert b"stream_format" in resp.read()
    conn.close()
