"""Generate ``data/questions-radio_dnn_416.hed``.

The reference points its TTS configs at Merlin's 416-feature question set
for the CMU ARCTIC radio phoneset (reference hparams.py:94-95, 174-175),
shipped there via the nnmnkwii_gallery submodule.  That file cannot be
vendored here, so this script AUTHORS an equivalent Merlin-format question
set producing exactly 416 linguistic features against standard HTS
full-context labels:

  p1^p2-p3+p4=p5@p6_p7/A:a1_a2_a3/B:b1-b2-b3@b4-b5&b6-b7#b8-b9$b10-b11
  !b12-b13;b14-b15|b16/C:c1+c2+c3/D:d1_d2/E:e1+e2@e3+e4&e5+e6#e7+e8
  /F:f1_f2/G:g1_g2/H:h1=h2@h3=h4|h5/I:i1_i2/J:j1+j2-j3

Composition (sums to 416):
  205  phone identity  QS: 41 radio phones x 5 quinphone positions
  165  phonetic class  QS: 33 classes       x 5 quinphone positions
    3  GPOS            QS: content-word flag for {prev, cur, next} word
   43  numeric        CQS: every numeric field of the context format

Deterministic: re-running reproduces the checked-in .hed byte-for-byte.
"""

from __future__ import annotations

import os

# CMU ARCTIC / festvox radio phoneset (41 phones incl. pau)
PHONES = [
    "aa", "ae", "ah", "ao", "aw", "ax", "ay", "b", "ch", "d", "dh", "eh",
    "er", "ey", "f", "g", "hh", "ih", "iy", "jh", "k", "l", "m", "n", "ng",
    "ow", "oy", "p", "pau", "r", "s", "sh", "t", "th", "uh", "uw", "v", "w",
    "y", "z", "zh",
]

# 33 phonetic classes over the radio phoneset (standard English phonetics).
# "sil"/"ssil" are folded into the Silence class so plain-HTS silence labels
# still answer it even though they are not radio identity phones.
CLASSES = [
    ("Vowel", ["aa", "ae", "ah", "ao", "aw", "ax", "ay", "eh", "er", "ey",
               "ih", "iy", "ow", "oy", "uh", "uw"]),
    ("Consonant", ["b", "ch", "d", "dh", "f", "g", "hh", "jh", "k", "l",
                   "m", "n", "ng", "p", "r", "s", "sh", "t", "th", "v",
                   "w", "y", "z", "zh"]),
    ("Silence", ["pau", "sil", "ssil"]),
    ("Stop", ["b", "d", "g", "k", "p", "t"]),
    ("Nasal", ["m", "n", "ng"]),
    ("Fricative", ["dh", "f", "hh", "s", "sh", "th", "v", "z", "zh"]),
    ("Affricate", ["ch", "jh"]),
    ("Approximant", ["l", "r", "w", "y"]),
    ("Liquid", ["l", "r"]),
    ("Glide", ["w", "y"]),
    ("Voiced_Consonant", ["b", "d", "dh", "g", "jh", "l", "m", "n", "ng",
                          "r", "v", "w", "y", "z", "zh"]),
    ("Unvoiced_Consonant", ["ch", "f", "hh", "k", "p", "s", "sh", "t",
                            "th"]),
    ("Front_Vowel", ["ae", "eh", "ey", "ih", "iy"]),
    ("Central_Vowel", ["ah", "ax", "er"]),
    ("Back_Vowel", ["aa", "ao", "ow", "uh", "uw"]),
    ("High_Vowel", ["ih", "iy", "uh", "uw"]),
    ("Mid_Vowel", ["ah", "ax", "eh", "er", "ey", "ow"]),
    ("Low_Vowel", ["aa", "ae", "ao", "aw", "ay"]),
    ("Rounded_Vowel", ["ao", "ow", "oy", "uh", "uw"]),
    ("Unrounded_Vowel", ["aa", "ae", "ah", "aw", "ax", "ay", "eh", "er",
                         "ey", "ih", "iy"]),
    ("Diphthong", ["aw", "ay", "ey", "ow", "oy"]),
    ("Monophthong", ["aa", "ae", "ah", "ao", "ax", "eh", "er", "ih", "iy",
                     "uh", "uw"]),
    ("Reduced_Vowel", ["ax"]),
    ("IVowel", ["ih", "iy"]),
    ("EVowel", ["eh", "er", "ey"]),
    ("AVowel", ["aa", "ae", "ah", "aw", "ax", "ay"]),
    ("OVowel", ["ao", "ow", "oy"]),
    ("UVowel", ["uh", "uw"]),
    ("Labial", ["b", "f", "m", "p", "v", "w"]),
    ("Dental", ["dh", "th"]),
    ("Alveolar", ["d", "l", "n", "r", "s", "t", "z"]),
    ("Palatal", ["ch", "jh", "sh", "y", "zh"]),
    ("Velar", ["g", "k", "ng"]),
]

# Quinphone positions: (tag, pattern template) — `{p}` is the phone slot.
# Delimiters follow the p1^p2-p3+p4=p5@ head of the context format.
POSITIONS = [
    ("LL", "{p}^*"),
    ("L", "*^{p}-*"),
    ("C", "*-{p}+*"),
    ("R", "*+{p}=*"),
    ("RR", "*={p}@*"),
]

# GPOS (guessed part of speech) content-word flags for prev/cur/next word
# (the reference labels carry gpos in the D/E/F fields).
GPOS = [
    ("L-Word_GPOS==content", "*/D:content_*"),
    ("C-Word_GPOS==content", "*/E:content+*"),
    ("R-Word_GPOS==content", "*/F:content_*"),
]

# Every numeric field of the full-context format, as Merlin CQS questions
# (one capture group; unmatched fields — "x" placeholders — answer -1).
CQS = [
    ("Pos_C-Seg_in_C-Syl(Fw)", r"@(\d+)_"),
    ("Pos_C-Seg_in_C-Syl(Bw)", r"_(\d+)/A:"),
    ("L-Syl_Stress", r"/A:(\d+)_"),
    ("L-Syl_Accent", r"/A:\d+_(\d+)_"),
    ("L-Syl_Num-Segs", r"/A:\d+_\d+_(\d+)/B:"),
    ("C-Syl_Stress", r"/B:(\d+)-"),
    ("C-Syl_Accent", r"/B:\d+-(\d+)-"),
    ("C-Syl_Num-Segs", r"/B:\d+-\d+-(\d+)@"),
    ("Pos_C-Syl_in_C-Word(Fw)", r"/B:\d+-\d+-\d+@(\d+)-"),
    ("Pos_C-Syl_in_C-Word(Bw)", r"@\d+-(\d+)&"),
    ("Pos_C-Syl_in_C-Phrase(Fw)", r"&(\d+)-"),
    ("Pos_C-Syl_in_C-Phrase(Bw)", r"&\d+-(\d+)#"),
    ("Num-StressedSyl_before_C-Syl", r"#(\d+)-"),
    ("Num-StressedSyl_after_C-Syl", r"#\d+-(\d+)\$"),
    ("Num-AccentedSyl_before_C-Syl", r"\$(\d+)-"),
    ("Num-AccentedSyl_after_C-Syl", r"\$\d+-(\d+)!"),
    ("Dist_from_prev-StressedSyl", r"!(\d+)-"),
    ("Dist_to_next-StressedSyl", r"!\d+-(\d+);"),
    ("Dist_from_prev-AccentedSyl", r";(\d+)-"),
    ("Dist_to_next-AccentedSyl", r";\d+-(\d+)\|"),
    ("R-Syl_Stress", r"/C:(\d+)\+"),
    ("R-Syl_Accent", r"/C:\d+\+(\d+)\+"),
    ("R-Syl_Num-Segs", r"/C:\d+\+\d+\+(\d+)/D:"),
    ("L-Word_Num-Syls", r"/D:[^_]*_(\d+)/E:"),
    ("C-Word_Num-Syls", r"/E:[^+]*\+(\d+)@"),
    ("Pos_C-Word_in_C-Phrase(Fw)", r"@(\d+)\+"),
    ("Pos_C-Word_in_C-Phrase(Bw)", r"@\d+\+(\d+)&"),
    ("Num-ContWord_before_C-Word", r"&(\d+)\+"),
    ("Num-ContWord_after_C-Word", r"&\d+\+(\d+)#"),
    ("Dist_from_prev-ContWord", r"#(\d+)\+"),
    ("Dist_to_next-ContWord", r"#\d+\+(\d+)/F:"),
    ("R-Word_Num-Syls", r"/F:[^_]*_(\d+)/G:"),
    ("L-Phrase_Num-Syls", r"/G:(\d+)_"),
    ("L-Phrase_Num-Words", r"/G:\d+_(\d+)/H:"),
    ("C-Phrase_Num-Syls", r"/H:(\d+)="),
    ("C-Phrase_Num-Words", r"/H:\d+=(\d+)@"),
    ("Pos_C-Phrase_in_Utt(Fw)", r"/H:\d+=\d+@(\d+)="),
    ("Pos_C-Phrase_in_Utt(Bw)", r"@\d+=(\d+)\|"),
    ("R-Phrase_Num-Syls", r"/I:(\d+)_"),
    ("R-Phrase_Num-Words", r"/I:\d+_(\d+)/J:"),
    ("Num-Syls_in_Utt", r"/J:(\d+)\+"),
    ("Num-Words_in_Utt", r"/J:\d+\+(\d+)-"),
    ("Num-Phrases_in_Utt", r"/J:\d+\+\d+-(\d+)"),
]


def generate():
    lines = []
    for tag, tmpl in POSITIONS:
        for p in PHONES:
            lines.append(f'QS "{tag}-{p}" {{{tmpl.format(p=p)}}}')
    for tag, tmpl in POSITIONS:
        for name, members in CLASSES:
            pats = ",".join(tmpl.format(p=p) for p in members)
            lines.append(f'QS "{tag}-{name}" {{{pats}}}')
    for name, pat in GPOS:
        lines.append(f'QS "{name}" {{{pat}}}')
    for name, pat in CQS:
        lines.append(f'CQS "{name}" {{{pat}}}')
    return "\n".join(lines) + "\n"


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    dst = os.path.join(here, "questions-radio_dnn_416.hed")
    text = generate()
    with open(dst, "w") as f:
        f.write(text)
    n_qs = text.count("\nQS") + text.startswith("QS")
    n_cqs = text.count("CQS")
    print(f"{dst}: {n_qs} QS + {n_cqs} CQS = {n_qs + n_cqs} features")


if __name__ == "__main__":
    main()
