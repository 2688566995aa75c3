from oron_tts_tpu.text.cleaner import TextCleaner
from oron_tts_tpu.text.numbers import NumberNormalizer
from oron_tts_tpu.text.tokenizer import (
    SPECIAL_TOKENS,
    VOCAB,
    VOCAB_SIZE,
    CyrillicTokenizer,
    validate_language,
)

__all__ = [
    "TextCleaner",
    "NumberNormalizer",
    "CyrillicTokenizer",
    "validate_language",
    "SPECIAL_TOKENS",
    "VOCAB",
    "VOCAB_SIZE",
]
