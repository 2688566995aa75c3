"""Objective end-to-end evaluation protocols (no reference analogue).

The reference ships no quantitative quality evaluation at all (SURVEY.md §6:
no RTF/MOS/WER figures anywhere). This package adds closed-loop protocols
that score the WHOLE framework — data pipeline, CFM training, sampler,
vocoder — with objective, network-free metrics.
"""

from oron_tts_tpu.evals.alignment import (  # noqa: F401
    char_error_rate,
    decode_logmel,
    decode_waveform,
    expected_letters,
    render_text,
)
