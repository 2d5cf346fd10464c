"""Synthetic HTS label + question-set fixtures for io/synthesis tests."""

import os
from os.path import join

import numpy as np

PHONES = ["sil", "hh", "ax", "l", "ow", "sil"]

QUESTIONS = """\
QS "C-Silence" {*-sil+*}
QS "C-Vowel" {*-ax+*,*-ow+*,*-iy+*}
QS "C-hh" {*-hh+*}
QS "C-l" {*-l+*}
QS "R-Silence" {*+sil=*}
QS "L-Silence" {*^sil-*}
CQS "Pos_in_word" {:(\\d+)_}
CQS "Num_syls" {&(\\d+)\\+}
"""


def make_question_file(path):
    with open(path, "w") as f:
        f.write(QUESTIONS)
    return path


def full_context(prev, cur, nxt, pos, nsyl):
    return f"x^{prev}-{cur}+{nxt}=x:{pos}_1&{nsyl}+2"


def make_label_file(path, phones=PHONES, states=5, frames_per_state=4,
                    frame_shift=50000):
    """State-aligned label: each phone has `states` states of
    frames_per_state frames (varied slightly per phone for realism)."""
    rs = np.random.RandomState(0)
    lines = []
    t = 0
    for p, cur in enumerate(phones):
        prev = phones[p - 1] if p > 0 else "x"
        nxt = phones[p + 1] if p + 1 < len(phones) else "x"
        ctx = full_context(prev, cur, nxt, p + 1, len(phones))
        for s in range(states):
            dur = (frames_per_state + int(rs.randint(0, 3))) * frame_shift
            lines.append(f"{t} {t + dur} {ctx}[{s + 2}]")
            t += dur
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


# --------------------------------------------------------------------------
# Full HTS-format synthetic TTS corpus (wav + label_state_align), exercising
# the DEFAULT config end-to-end incl. data/questions-radio_dnn_416.hed.
# --------------------------------------------------------------------------

RADIO_VOWELS = ["aa", "ae", "ah", "ao", "eh", "ey", "ih", "iy", "ow", "uw"]
RADIO_CONSONANTS = ["b", "d", "f", "hh", "k", "l", "m", "n", "r", "s", "t",
                    "w", "z"]


def _full_context_hts(ll, l, c, r, rr, seg_fw, seg_bw, rs):
    """Standard HTS full-context string; silence phones get 'x' numerics."""
    if c == "pau":
        return (f"{ll}^{l}-{c}+{r}={rr}@x_x/A:x_x_x/B:x-x-x@x-x&x-x#x-x$"
                "x-x!x-x;x-x|x/C:0+0+2/D:x_x/E:x+x@x+x&x+x#x+x/F:content_1"
                "/G:x_x/H:x=x@1=1|x/I:4_3/J:6+4-2")
    n = lambda lo, hi: int(rs.randint(lo, hi + 1))
    b16 = c if c in RADIO_VOWELS else "novowel"
    return (f"{ll}^{l}-{c}+{r}={rr}@{seg_fw}_{seg_bw}"
            f"/A:{n(0,1)}_{n(0,1)}_{n(1,3)}"
            f"/B:{n(0,1)}-{n(0,1)}-{seg_fw + seg_bw - 1}@{n(1,2)}-{n(1,2)}"
            f"&{n(1,4)}-{n(1,4)}#{n(0,2)}-{n(0,2)}${n(0,2)}-{n(0,2)}"
            f"!{n(0,3)}-{n(0,3)};{n(0,3)}-{n(0,3)}|{b16}"
            f"/C:{n(0,1)}+{n(0,1)}+{n(1,3)}"
            f"/D:content_{n(1,2)}/E:content+{n(1,2)}@{n(1,4)}+{n(1,4)}"
            f"&{n(1,3)}+{n(1,3)}#{n(0,2)}+{n(0,2)}/F:content_{n(1,2)}"
            f"/G:{n(3,8)}_{n(2,5)}/H:{n(3,8)}={n(2,5)}@1=1|L-L%"
            f"/I:{n(3,8)}_{n(2,5)}/J:{n(6,14)}+{n(4,9)}-{n(1,2)}")


def make_tts_corpus(root, num=10, fs=16000, seed=0, states=5,
                    frame_shift_100ns=50000):
    """Synthetic Merlin slt_arctic-layout corpus: <root>/wav/*.wav +
    <root>/label_state_align/*.lab with full-context labels whose timings
    exactly match the generated waveforms (5 ms hop)."""
    rs = np.random.RandomState(seed)
    os.makedirs(join(root, "wav"), exist_ok=True)
    os.makedirs(join(root, "label_state_align"), exist_ok=True)
    hop = int(fs * frame_shift_100ns / 1e7)  # samples per frame

    for i in range(num):
        n_core = int(rs.randint(5, 9))
        phones = ["pau"]
        for _ in range(n_core):
            if rs.rand() < 0.5:
                phones.append(RADIO_VOWELS[rs.randint(len(RADIO_VOWELS))])
            else:
                phones.append(
                    RADIO_CONSONANTS[rs.randint(len(RADIO_CONSONANTS))])
        phones.append("pau")

        lines, t = [], 0
        frame_cursor = 0
        voiced_frames = []  # (start_frame, end_frame, f0) per voiced phone
        for p, cur in enumerate(phones):
            ctx = _full_context_hts(
                phones[p - 2] if p >= 2 else "x",
                phones[p - 1] if p >= 1 else "x",
                cur,
                phones[p + 1] if p + 1 < len(phones) else "x",
                phones[p + 2] if p + 2 < len(phones) else "x",
                seg_fw=1, seg_bw=1, rs=rs)
            phone_frames = 0
            for s in range(states):
                dur_frames = int(rs.randint(2, 6)) + (4 if cur == "pau" else 0)
                dur = dur_frames * frame_shift_100ns
                lines.append(f"{t} {t + dur} {ctx}[{s + 2}]")
                t += dur
                phone_frames += dur_frames
            if cur in RADIO_VOWELS:
                f0 = float(rs.uniform(110, 220))
                voiced_frames.append(
                    (frame_cursor, frame_cursor + phone_frames, f0))
            frame_cursor += phone_frames

        with open(join(root, "label_state_align", f"utt_{i:04d}.lab"),
                  "w") as f:
            f.write("\n".join(lines) + "\n")

        # waveform: voiced phones = harmonic tone, rest = weak noise
        n_samples = frame_cursor * hop
        x = rs.randn(n_samples) * 0.01
        tt = np.arange(n_samples) / fs
        for f0_s, f0_e, f0 in voiced_frames:
            s0, s1 = f0_s * hop, f0_e * hop
            seg = (0.4 * np.sin(2 * np.pi * f0 * tt[s0:s1])
                   + 0.2 * np.sin(4 * np.pi * f0 * tt[s0:s1])
                   + 0.1 * np.sin(6 * np.pi * f0 * tt[s0:s1]))
            x[s0:s1] += seg
        x = (x / np.abs(x).max() * 0.5 * 32767).astype(np.int16)
        from scipy.io import wavfile
        wavfile.write(join(root, "wav", f"utt_{i:04d}.wav"), fs, x)
    return root


def make_arctic_vc_corpus(root, num=12, fs=16000, seed=0):
    """Synthetic CMU-ARCTIC-layout parallel corpus for the VC demo:
    <root>/cmu_us_{clb,slt}_arctic/wav/arctic_a%04d.wav.  Pair i shares a
    'phone sequence' (same segment structure) but the two 'speakers' differ
    in f0 scale, formants and segment durations (DTW-alignable)."""
    rs = np.random.RandomState(seed)
    import scipy.signal
    from scipy.io import wavfile

    speakers = {
        "clb": dict(f0_scale=1.0, formants=((730, 70), (1100, 90),
                                            (2400, 120))),
        "slt": dict(f0_scale=1.25, formants=((660, 60), (1200, 100),
                                             (2600, 140))),
    }
    for spk in speakers:
        os.makedirs(join(root, f"cmu_us_{spk}_arctic", "wav"), exist_ok=True)

    for i in range(num):
        # shared segment plan: (voiced?, nominal duration s, rel f0)
        n_seg = int(rs.randint(4, 7))
        plan = [(bool(rs.rand() < 0.6), float(rs.uniform(0.08, 0.2)),
                 float(rs.uniform(0.9, 1.1))) for _ in range(n_seg)]
        base_f0 = float(rs.uniform(110, 160))
        for spk, cfg in speakers.items():
            stretch = rs.uniform(0.85, 1.15, size=n_seg)
            x = []
            for s_i, (voiced, dur, rel) in enumerate(plan):
                n = int(dur * stretch[s_i] * fs)
                tt = np.arange(n) / fs
                if voiced:
                    f0 = base_f0 * rel * cfg["f0_scale"]
                    seg = sum(np.sin(2 * np.pi * f0 * h * tt) / np.sqrt(h)
                              for h in range(1, int(0.4 * fs / f0) + 1))
                    seg = np.asarray(seg) + 0.02 * rs.randn(n)
                else:
                    seg = 0.3 * rs.randn(n)
                x.append(seg)
            x = np.concatenate(x)
            b_all, a_all = np.array([1.0]), np.array([1.0])
            for fc, bw in cfg["formants"]:
                r = np.exp(-np.pi * bw / fs)
                th = 2 * np.pi * fc / fs
                a_all = np.convolve(a_all,
                                    np.array([1.0, -2 * r * np.cos(th),
                                              r * r]))
                b_all = np.convolve(b_all, np.array([1.0 - r]))
            x = scipy.signal.lfilter(b_all, a_all, x)
            x = (x / np.abs(x).max() * 0.5 * 32767).astype(np.int16)
            wavfile.write(
                join(root, f"cmu_us_{spk}_arctic", "wav",
                     f"arctic_a{i:04d}.wav"), fs, x)
    return root


# hparams override strings shared by the e2e/demo subprocess tests: tiny
# SRU generator + MLP discriminator (dims inferred at startup).
SMALL_SRU = ("generator_params={'in_dim': None, 'out_dim': None,"
             " 'num_hidden': 1, 'hidden_dim': 16, 'bidirectional': False,"
             " 'dropout': 0.0, 'use_relu': 1, 'rnn_dropout': 0.0,"
             " 'last_sigmoid': False}")
SMALL_D = ("discriminator_params={'in_dim': None, 'out_dim': 1,"
           " 'num_hidden': 1, 'hidden_dim': 8, 'dropout': 0.0,"
           " 'last_sigmoid': True}")
