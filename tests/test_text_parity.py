"""Behavioral parity of the text stack against the PyTorch reference.

The reference text modules are pure Python (no torch), so we import them
directly from /root/reference and fuzz-compare outputs. Skipped when the
reference checkout is absent.
"""

import pytest

from tests.conftest import add_reference_to_path, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)

SAMPLES = [
    "Сайн байна уу",
    "Тэр 25 настай, 1995 онд төрсөн.",
    "Үнэ: 1,500,000₮ буюу $450 орчим.",
    "Хурал 2024/03/15-ны 09:30 цагт эхэлнэ.",
    "Температур -15°C хүртэл буурна.",
    "3.14 бол пи тоо, 1/2 нь хагас, 3/4 аналог.",
    "Утас: +976 8812 3456 руу залгана уу.",
    "XV зуун ба 20-р зуун өөр.",
    "10-20 хувь өснө, 5-ын дүн 3-ийн дүнгээс их.",
    "Бид 5 км алхаж, 2 кг алим авав; 3 л ус, 500 г будаа.",
    "Тэгвэл 7 × 8 = 56 болно, 100 ÷ 4 = 25.",
    "Энэ ном 2500 төгрөг, тэр 1000000 төгрөг.",
    "…тийм ээ — «тэгье» гэв!!",
    "Б.Батболд 1990 г. төрсөн.",
    "өчигдөр 23:59:59 цагт дууссан",
    "Жилд 365.25 өдөр байдаг",
    "2024-01-05 ба 05-01-2024 ижил өдөр",
    "50% ≤ 75% ≥ 25% ~100",
    "EUR 100 ба 100 EUR ба 100EUR",
    "IX сар айсуй",
]

KZ_SAMPLES = [
    "Сәлеметсіз бе",
    "Ол 25 жаста, 1995 жылы туған.",
    "Бағасы 1500 теңге немесе $5.",
    "Жиналыс 2024/03/15 күні 09:30 басталады.",
    "Температура -15°C дейін төмендейді.",
    "3.14 деген пи саны, 1/2 жарты.",
    "10-20 пайыз өседі.",
    "Біз 5 км жүрдік, 2 кг алма алдық.",
    "5-ші орын мен 20-р ғасыр.",
]


@pytest.fixture(scope="module")
def ref_modules():
    add_reference_to_path()
    from src.utils.number_norm import NumberNormalizer as RefNorm
    from src.utils.text_cleaner import TextCleaner as RefCleaner
    from src.utils.tokenizer import CyrillicTokenizer as RefTok

    return RefTok, RefNorm, RefCleaner


def test_vocab_parity(ref_modules):
    RefTok, _, _ = ref_modules
    from oron_tts_tpu.text import VOCAB, CyrillicTokenizer

    ref, ours = RefTok(), CyrillicTokenizer()
    assert ref.vocab_size == ours.vocab_size == len(VOCAB)
    for idx, token in enumerate(VOCAB):
        assert ref.id_to_token(idx) == token


def test_encode_parity(ref_modules):
    RefTok, _, _ = ref_modules
    from oron_tts_tpu.text import CyrillicTokenizer

    ref, ours = RefTok(), CyrillicTokenizer()
    for text in ["сайн уу", "qё", "", "ә і ғ", ".,!?"]:
        for lang in ("mn", "kz"):
            assert ref.encode(text, lang=lang) == ours.encode(text, lang=lang)
    attrs = ["[FEMALE]", "[ELDERLY]", "[BOGUS]"]
    assert ref.encode("аа", "mn", attrs) == ours.encode("аа", "mn", attrs)


def test_cardinal_parity_exhaustive(ref_modules):
    _, RefNorm, _ = ref_modules
    from oron_tts_tpu.text import NumberNormalizer

    for lang in ("mn", "kz"):
        ref, ours = RefNorm(lang=lang), NumberNormalizer(lang=lang)
        numbers = (
            list(range(0, 130))
            + [200, 305, 999, 1000, 1001, 2024, 9999, 10000, 123456, 1_000_000,
               2_500_000, 1_000_000_000, 987_654_321, -5, -1234]
        )
        for n in numbers:
            assert ref.convert(n) == ours.convert(n), (lang, n)
            assert ref.convert_attributive(n) == ours.convert_attributive(n), (lang, n)
            if n > 0:
                assert ref.convert_ordinal(n) == ours.convert_ordinal(n), (lang, n)


def test_normalize_text_parity(ref_modules):
    _, RefNorm, _ = ref_modules
    from oron_tts_tpu.text import NumberNormalizer

    for lang, samples in (("mn", SAMPLES), ("kz", KZ_SAMPLES)):
        ref, ours = RefNorm(lang=lang), NumberNormalizer(lang=lang)
        for s in samples:
            if _hits_known_reference_bug(s):
                continue
            assert ref.normalize_text(s) == ours.normalize_text(s), (lang, s)


def test_cleaner_parity(ref_modules):
    _, _, RefCleaner = ref_modules
    from oron_tts_tpu.text import TextCleaner

    ref, ours = RefCleaner(), TextCleaner()
    for lang, samples in (("mn", SAMPLES), ("kz", KZ_SAMPLES)):
        for s in samples:
            if _hits_known_reference_bug(s):
                continue
            assert ref.clean(s, lang=lang) == ours.clean(s, lang=lang), (lang, s)
            assert ref.text_to_sequence(s, lang=lang) == ours.text_to_sequence(
                s, lang=lang
            ), (lang, s)


def test_normalize_text_fuzz_parity(ref_modules):
    """Randomized digit-pattern fuzzing against the reference cascade."""
    import random

    _, RefNorm, _ = ref_modules
    from oron_tts_tpu.text import NumberNormalizer

    rng = random.Random(1234)
    atoms = [
        lambda: str(rng.randint(0, 99999)),
        lambda: f"{rng.randint(0, 9999)}.{rng.randint(0, 999)}",
        lambda: f"{rng.randint(1, 12)}/{rng.randint(1, 31)}",
        lambda: f"{rng.randint(0, 23)}:{rng.randint(0, 59):02d}",
        lambda: f"{rng.randint(1, 2100)}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}",
        lambda: f"{rng.randint(0, 100)}%",
        lambda: f"{rng.randint(1, 999)}₮",
        lambda: f"${rng.randint(1, 999)}",
        lambda: f"-{rng.randint(0, 50)}°C",
        lambda: f"{rng.randint(1, 99)}-р",
        lambda: f"{rng.randint(1, 30)}-{rng.randint(31, 99)}",
        lambda: f"+976 {rng.randint(1000, 9999)} {rng.randint(1000, 9999)}",
        lambda: rng.choice(["XIV", "III", "XL", "MCMXCIX", "VII"]),
        lambda: rng.choice(["үг", "ном", "хүн", "жил", "=", "+", "~"]),
    ]
    for lang in ("mn", "kz"):
        ref, ours = RefNorm(lang=lang), NumberNormalizer(lang=lang)
        for _ in range(200):
            text = " ".join(rng.choice(atoms)() for _ in range(rng.randint(1, 6)))
            if _hits_known_reference_bug(text):
                continue
            assert ref.normalize_text(text) == ours.normalize_text(text), (
                lang, text,
            )


def _hits_known_reference_bug(text: str) -> bool:
    """Inputs where we INTENTIONALLY diverge from the reference.

    (a) the reference's thousands-separator regex has no digit-boundary
    guards (number_norm.py:385), merging adjacent independent numbers
    ("2023 150" → 2023150); (b) its attributive character class omits
    ө/ү (number_norm.py:555), so "3 өдөр" renders a standalone cardinal.
    Both are fixed in oron_tts_tpu.text.numbers — see
    test_normalize_text_reference_bug_fixes for the pinned behavior."""
    import re

    return bool(
        re.search(r"\d[ ,]\d{3}\d", text)        # 3-digit group mid-number
        or re.search(r"\d{4,}[ ,]\d{3}", text)   # >3-digit head merging
        or re.search(r"\d\s+[өүӨҮ]", text)       # ө/ү-initial noun follows
        # × expands to MN "үржүүлэх" before the attributive stage — the
        # reference then renders "7 × 8" standalone but "8 = 56"
        # attributive; ours is consistently attributive
        or re.search(r"\d\s*×", text)
    )


def test_normalize_text_reference_bug_fixes(ref_modules):
    """Pinned intentional improvements over the reference normalizer."""
    from oron_tts_tpu.text import NumberNormalizer

    ours = NumberNormalizer(lang="mn")
    # adjacent independent numbers stay separate (ref merges to 2,023,150)
    assert ours.normalize_text("2023 150 хүн") == (
        "хоёр мянга хорин гурав зуун тавин хүн"
    )
    # legit thousands separators still merge
    assert ours.normalize_text("1 234 567 хүн") == ours.normalize_text(
        "1234567 хүн"
    )
    # ө/ү-initial nouns take the attributive form (ref: standalone cardinal)
    assert ours.normalize_text("3 өдөр") == "гурван өдөр"
    assert ours.normalize_text("5 үхэр") == "таван үхэр"
