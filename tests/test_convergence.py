"""Learning-dynamics check: eval loss drops materially after optimization.

Overfits the tiny model on a 4-sample synthetic dataset; the deterministic
eval-mode CFM loss (fixed t/span/noise) must fall well below its initial
value, proving the optimizer/EMA/guard wiring trains the DiT for real.
"""

import numpy as np

from oron_tts_tpu.config import F5Config
from oron_tts_tpu.data.dataset import FixedBatchSampler, TTSCollator
from oron_tts_tpu.data.loader import DataLoader
from oron_tts_tpu.models.f5tts import F5TTS
from oron_tts_tpu.train.trainer import F5Trainer


def test_loss_decreases(tmp_path):
    cfg = {
        "sample_rate": 24000, "n_mels": 100,
        "learning_rate": 2e-3, "warmup_steps": 10, "num_epochs": 40,
        "ema_decay": 0.99, "max_grad_norm": 1.0, "use_tqdm": False,
        "audio_sample_interval": 10**9, "log_interval": 10**9,
        "model": {
            "vocab_size": 65, "dim": 64, "depth": 2, "heads": 2,
            "ff_mult": 2, "text_dim": 32, "conv_layers": 1, "p_dropout": 0.0,
        },
    }
    rng = np.random.default_rng(0)
    sr = 24000
    arrays, texts = [], []
    for i in range(4):
        t = np.arange(int(sr * 1.0)) / sr
        arrays.append(
            (0.5 * np.sin(2 * np.pi * (180 + 60 * i) * t)).astype(np.float32)
        )
        texts.append("нэг хоёр гурав дөрөв")
    from oron_tts_tpu.data.dataset import TTSDataset

    ds = TTSDataset(audio_arrays=arrays, texts=texts, sample_rate=sr)
    collator = TTSCollator(pad_to_multiple=64)
    loader = DataLoader(ds, FixedBatchSampler(len(ds), 4, seed=0), collator,
                        num_workers=0)

    model = F5TTS.from_config(F5Config.from_dict(cfg))
    trainer = F5Trainer(
        config=cfg, model=model, train_loader=loader,
        val_loader=DataLoader(
            ds, FixedBatchSampler(len(ds), 4, shuffle=False, drop_last=False),
            collator, num_workers=0,
        ),
        log_dir=str(tmp_path / "logs"), checkpoint_dir=str(tmp_path / "ckpt"),
    )

    initial = trainer.validate(use_ema=False)
    for _ in range(40):
        trainer.train_epoch(total_epochs=40)
    final = trainer.validate(use_ema=False)
    final_ema = trainer.validate(use_ema=True)

    assert np.isfinite(final)
    # zero-init model predicts 0 → eval loss ≈ E||x1-x0||²; training must
    # cut it by at least 35%
    assert final < 0.65 * initial, (initial, final)
    assert final_ema < initial, (initial, final_ema)

    # the trained model must also synthesize without error
    trainer.finish()
    wav = model.synthesize("нэг хоёр", n_steps=2, target_duration_s=0.4, seed=0)
    assert np.isfinite(wav).all()
