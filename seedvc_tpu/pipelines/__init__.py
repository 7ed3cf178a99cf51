from seedvc_tpu.pipelines.convert import VoiceConverter  # noqa: F401
