"""Unit tests for the text stack: tokenizer, number normalizer, cleaner."""

from oron_tts_tpu.text import (
    VOCAB_SIZE,
    CyrillicTokenizer,
    NumberNormalizer,
    TextCleaner,
)


def test_vocab_contract():
    tok = CyrillicTokenizer()
    assert tok.vocab_size == 65 == VOCAB_SIZE
    assert tok.pad_id == 0
    assert tok.unk_id == 3
    assert tok.token_to_id("[LANG_MN]") == 4
    assert tok.token_to_id("[LANG_KZ]") == 5
    # first char after the 11 specials
    assert tok.token_to_id("а") == 11


def test_encode_layout_and_roundtrip():
    tok = CyrillicTokenizer()
    ids = tok.encode("сайн уу", lang="mn", attr_tokens=["[FEMALE]", "[YOUNG]"])
    assert ids[0] == tok.token_to_id("[LANG_MN]")
    assert ids[1] == tok.token_to_id("[FEMALE]")
    assert ids[2] == tok.token_to_id("[YOUNG]")
    assert tok.decode(ids) == "сайн уу"


def test_unknown_chars_map_to_unk():
    tok = CyrillicTokenizer()
    ids = tok.encode("q", lang="kz")
    assert ids == [tok.token_to_id("[LANG_KZ]"), tok.unk_id]


def test_invalid_language_raises():
    tok = CyrillicTokenizer()
    try:
        tok.encode("x", lang="en")
    except ValueError:
        pass
    else:
        raise AssertionError("expected ValueError")


def test_mn_cardinals():
    n = NumberNormalizer("mn")
    assert n.convert(0) == "тэг"
    assert n.convert(5) == "тав"
    assert n.convert_attributive(5) == "таван"
    assert n.convert(15) == "арван тав"
    assert n.convert(20) == "хорь"
    assert n.convert_attributive(25) == "хорин таван"
    assert n.convert(100) == "зуу"
    assert n.convert_attributive(100) == "зуун"
    assert n.convert(105) == "зуун тав"
    assert n.convert(1000) == "мянга"
    assert n.convert_attributive(1000) == "мянган"
    assert n.convert(5000) == "таван мянга"
    assert n.convert(5005) == "таван мянга тав"
    assert n.convert(-3) == "хасах гурав"
    assert n.convert(1_000_000) == "сая"
    assert n.convert(2_500_000) == "хоёр сая таван зуун мянга"


def test_mn_ordinals_vowel_harmony():
    n = NumberNormalizer("mn")
    assert n.convert_ordinal(5) == "тавдугаар"  # 'а' → дугаар
    assert n.convert_ordinal(4) == "дөрөвдүгээр"  # 'ө' → дүгээр
    assert n.convert_ordinal(3) == "гуравдугаар"


def test_kz_cardinals():
    n = NumberNormalizer("kz")
    assert n.convert(5) == "бес"
    assert n.convert(15) == "он бес"
    assert n.convert(25) == "жиырма бес"
    assert n.convert(100) == "жүз"
    assert n.convert(1000) == "мың"
    # kazakh ordinal = cardinal + attached suffix, NO stem mutation — the
    # reference's model (standard Kazakh would be "бесінші"; parity with
    # the reference is pinned exhaustively in test_text_parity)
    assert n.convert_ordinal(5) == "беснші"
    assert n.convert_ordinal(2) == "екінші"
    assert n.convert_ordinal(20) == "жиырманші"


def test_normalize_text_cases_mn():
    n = NumberNormalizer("mn")
    assert n.normalize_text("25%") == "хорин таван хувь"
    assert n.normalize_text("100₮") == "зуун төгрөг"
    assert n.normalize_text("$50") == "тавин доллар"
    assert n.normalize_text("3.5") == "гурав цэг тав"
    assert n.normalize_text("1/2") == "хагас"
    assert n.normalize_text("10-20") == "арав аас хорь хүртэл"
    assert n.normalize_text("5-р") == "тавдугаар"
    assert n.normalize_text("12:30") == "арван хоёр цаг гучин минут"
    assert n.normalize_text("25°C") == "хорин таван градус цельсий"
    assert "оны" in n.normalize_text("2024/01/15")
    assert n.normalize_text("1,234,567") == n.normalize_text("1234567")
    assert n.normalize_text("5 ном") == "таван ном"
    assert n.normalize_text("тав 5") == "тав тав"


def test_normalize_text_cases_kz():
    n = NumberNormalizer("kz")
    assert n.normalize_text("25%") == "жиырма бес пайыз"
    assert n.normalize_text("1/2") == "жарты"
    assert n.normalize_text("10-20") == "он ден жиырма дейін"


def test_cleaner_pipeline():
    c = TextCleaner()
    assert c.clean("Сайн   байна уу??", lang="mn") == "сайн байна уу?"
    assert c.clean("«Монгол»", lang="mn") == '"монгол"'
    out = c.clean("Тэр 25 настай.", lang="mn")
    assert "хорин таван" in out
    # latin letters are dropped
    assert c.clean("abc сайн", lang="mn") == "сайн"


def test_cleaner_text_to_sequence_no_unk():
    c = TextCleaner()
    tok = CyrillicTokenizer()
    ids = c.text_to_sequence("Сайн байна уу, 25°C байна!", lang="mn")
    assert tok.unk_id not in ids
    assert ids[0] == tok.token_to_id("[LANG_MN]")
