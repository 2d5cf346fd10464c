"""Synthetic HTS label + question-set fixtures for io/synthesis tests."""

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
