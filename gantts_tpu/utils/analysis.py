"""Quantitative analyses from the reference's evaluation notebooks.

The reference publishes its quality evidence as notebook plots
(notebooks/Test VC.ipynb, Test RNN VC.ipynb; SURVEY.md section 4): global
variance (GV) of the mel-cepstra and modulation spectra of natural vs
generated features.  These are their computational cores as library
functions so any experiment can log them.
"""

from __future__ import annotations

import numpy as np


def global_variance(features):
    """Per-dimension global variance over all frames of one or more
    utterances.  ``features``: (T, D) or list of (T, D).  GAN training is
    expected to push generated GV toward natural GV (Saito 2017's key
    metric)."""
    if isinstance(features, (list, tuple)):
        features = np.concatenate([np.asarray(f) for f in features], axis=0)
    return np.var(np.asarray(features, dtype=np.float64), axis=0)


def modulation_spectrum(features, modfs, n=4096):
    """Mean log modulation spectrum per dimension.

    Returns (freqs, log_ms) with ``log_ms`` shape (n//2+1, D): the log power
    of the temporal DFT of each trajectory dimension — adversarial training
    should recover the high-band modulation energy that MGE-only training
    oversmooths."""
    from gantts_tpu.preprocessing import modspec

    if isinstance(features, (list, tuple)):
        specs = [modspec(np.asarray(f, dtype=np.float64), n=n)
                 for f in features]
        ms = np.mean(specs, axis=0)
    else:
        ms = modspec(np.asarray(features, dtype=np.float64), n=n)
    freqs = np.fft.rfftfreq(n, d=1.0 / modfs)
    return freqs, np.log(np.maximum(ms, 1e-30))
