from oron_tts_tpu.models.cfm import CFM, CFMConfig
from oron_tts_tpu.models.dit import DiT, InputEmbedding
from oron_tts_tpu.models.f5tts import F5TTS, split_text_for_synthesis
from oron_tts_tpu.models.text_embed import TextEmbedding
from oron_tts_tpu.models.vocos import VocosDecoder

__all__ = [
    "F5TTS",
    "DiT",
    "CFM",
    "CFMConfig",
    "InputEmbedding",
    "TextEmbedding",
    "VocosDecoder",
    "split_text_for_synthesis",
]
