#!/usr/bin/env python
"""Sweep the TTS acoustic GAN curriculum knobs (VERDICT round-3 item 3).

The round-3 dossier showed the adversarial acoustic config cutting the
high-band modulation-spectrum deficit only to 0.70x the MGE baseline while
test MCD rose 3.02 -> 3.57 dB.  This tool isolates the knobs the curriculum
exposes (reference train_gan.sh:48-108 stage semantics; Saito 2017's
adversarial-weight discussion) and measures each setting end-to-end on the
speech-like dossier corpus:

  * w_d               stage-5 adversarial weight (scales the dynamic
                      w_d * E(mge)/E(adv) weight, train/loop.py:34)
  * D_WARMUP          discriminator-warmup epochs (stage 3 length)
  * lr_adv            stage-5 learning rate (both optimizers reset at the
                      stage boundary via --reset_optimizers, so a stage-own
                      lr is well-defined)
  * adversarial epochs (stage-5 nepoch; restart_epoch stays at G_WARMUP)

The expensive shared prefix (corpus, features, MGE baseline, G warmup) is
trained ONCE; each sweep point reruns only the D warmup + adversarial stage
(the only stages the knobs touch) and is scored with an acoustic-model-only
evaluation on the held-out test split: natural linguistic input at natural
durations -> per-stream MLPG statics -> high-band modulation-spectrum
deficit vs the natural mgc statics (utils/analysis.py), plus the final
train/test MCD the stage logged.

usage:
    python tools/tts_gan_sweep.py [--root /tmp/gantts_sweep]
        [--points name=...] [--out sweep.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
from os.path import dirname, exists, join

import numpy as np

REPO = dirname(dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EPOCHS = 30          # baseline + adversarial total (dossier setting)
G_WARMUP = 8
HP_BASE = "batch_size=8"

# Sweep grid: one anchor (the round-3 dossier setting) + one-knob-at-a-time
# variations.  Points are (name, dict) with keys w_d, d_warmup, lr, nepoch.
POINTS = [
    ("anchor_wd1", dict(w_d=1.0, d_warmup=4)),
    ("wd0.3", dict(w_d=0.3, d_warmup=4)),
    ("wd3", dict(w_d=3.0, d_warmup=4)),
    ("dwarm8", dict(w_d=1.0, d_warmup=8)),
    # Adagrad's reset-optimizer shock at the stage-5 boundary (fresh
    # accumulator -> +-lr/coordinate first steps) re-perturbs the warmed-up
    # G; a gentler stage-5 lr tests whether the MCD blowup is that shock
    # rather than the adversarial signal itself.
    ("lr3e-3", dict(w_d=1.0, d_warmup=4, lr=0.003)),
    ("lr1e-3", dict(w_d=1.0, d_warmup=4, lr=0.001)),
    ("wd0.3_lr3e-3", dict(w_d=0.3, d_warmup=4, lr=0.003)),
    ("long_adv", dict(w_d=1.0, d_warmup=4, nepoch=60)),
    # Asymmetric D learning rate (G stays at the bundle default): on the
    # 100-utterance dossier corpus the D overfits within a few epochs and
    # its gradients push G into hallucinated hi-band texture (every
    # symmetric point above trips the MCD-blowup bound); slowing only D
    # is the classic stabilizer (TTTS/GAN folklore; Heusel 2017 TTUR
    # argues the reverse ratio for big corpora, but the overfit direction
    # here is D ahead of G).
    ("dlr3e-3", dict(w_d=1.0, d_warmup=4, d_lr=0.003)),
    ("dlr1e-3", dict(w_d=1.0, d_warmup=4, d_lr=0.001)),
    ("wd0.3_dlr1e-3", dict(w_d=0.3, d_warmup=4, d_lr=0.001)),
    # Measured (dlr3e-3): slowing ONLY D made both measures worse (GV
    # 0.36, deficit ratio 0.95) — D overfit is not the binding failure.
    # The blowup signature (train MCD tracks test MCD upward) says the
    # stage-5 G updates themselves wreck the warmed-up solution: Adagrad's
    # fresh accumulator makes the first steps +-lr/coordinate at lr=0.01.
    # These points push the adversarial signal harder/longer once the lr
    # shock is removed.
    ("wd3_lr1e-3", dict(w_d=3.0, d_warmup=4, lr=0.001)),
    ("lr1e-3_long", dict(w_d=1.0, d_warmup=4, lr=0.001, nepoch=60)),
]


def sh(cmd, cwd, timeout=3600):
    t0 = time.time()
    r = subprocess.run(cmd, cwd=cwd, capture_output=True, text=True,
                       timeout=timeout, env=dict(os.environ))
    if r.returncode != 0:
        raise RuntimeError(
            f"{' '.join(cmd)} failed:\n{r.stdout[-1500:]}\n{r.stderr[-3000:]}")
    return time.time() - t0


def train_cmd(data, ckpt_dir, nepoch, hparams_extra="", **flags):
    cmd = [sys.executable, join(REPO, "train.py"),
           "--hparams_name=tts_acoustic",
           f"--hparams={HP_BASE},nepoch={nepoch}"
           + ("," + hparams_extra if hparams_extra else ""),
           f"--checkpoint-dir={ckpt_dir}",
           f"--log-event-path={ckpt_dir}/log"]
    for k, v in flags.items():
        flag = "--" + k.replace("_", "-") if k in (
            "checkpoint_g", "checkpoint_d", "discriminator_warmup") \
            else "--" + k
        cmd.append(flag if v is True else f"{flag}={v}")
    cmd += [join(data, "X_acoustic"), join(data, "Y_acoustic")]
    return cmd


def final_scalar(log_dir, tag):
    vals = []
    with open(join(log_dir, "scalars.jsonl")) as f:
        for line in f:
            row = json.loads(line)
            if row["tag"] == tag:
                vals.append(row["value"])
    return round(float(vals[-1]), 4) if vals else None


def eval_acoustic(ckpt_path, data_dir, hparams_extra=""):
    """Acoustic-model-only quality on the held-out test split: natural
    linguistic input at natural durations -> mgc statics -> modspec
    hi-band deficit + GV ratio vs natural, plus per-utterance MCD."""
    from gantts_tpu import hparams
    from gantts_tpu import preprocessing as P
    from gantts_tpu.data import NPYDataSource
    from gantts_tpu.models import create_model
    from gantts_tpu.synthesis import gen_parameters, get_jitted_forward
    from gantts_tpu.train.checkpoint import load_checkpoint
    from gantts_tpu.utils.analysis import _hi_band_db, global_variance

    hp = hparams.tts_acoustic.copy()
    hp.parse(HP_BASE + ("," + hparams_extra if hparams_extra else ""))
    X_min = np.load(join(data_dir, "X_acoustic_data_min.npy"))
    X_max = np.load(join(data_dir, "X_acoustic_data_max.npy"))
    Y_mean = np.load(join(data_dir, "Y_acoustic_data_mean.npy"))
    Y_std = np.sqrt(np.load(join(data_dir, "Y_acoustic_data_var.npy")))
    if hp.generator_params["in_dim"] is None:
        hp.generator_params["in_dim"] = X_min.shape[-1]
    if hp.generator_params["out_dim"] is None:
        hp.generator_params["out_dim"] = Y_mean.shape[-1]
    model = create_model(hp.generator, **hp.generator_params)
    variables, _, _ = load_checkpoint(ckpt_path)
    fwd = get_jitted_forward(model, variables, hp, needs_R=False)

    K = len(hp.windows)
    sd = hp.stream_sizes[0] // K
    xs = NPYDataSource(join(data_dir, "X_acoustic"),
                       train=False, test=True).collect_files()
    gen_mgc, nat_mgc, mcds = [], [], []
    for xf in xs:
        x = np.load(xf)
        y_nat = np.load(xf.replace("X_acoustic", "Y_acoustic"))
        x = P.minmax_scale(x, X_min, X_max,
                           feature_range=(0.01, 0.99)).astype(np.float32)
        y_hat = fwd(x)
        mgc, _, _, _ = gen_parameters(
            np.asarray(y_hat, np.float64), Y_mean, Y_std, hp)
        gen_mgc.append(mgc)
        nat_mgc.append(y_nat[:, :sd])
        d = mgc[:, 1:] - y_nat[:, 1:sd]
        mcds.append(float(np.mean(
            10.0 / np.log(10.0) * np.sqrt(2.0 * np.sum(d * d, axis=1)))))
    modfs = 1000.0 / hp.frame_period
    deficit = (_hi_band_db(nat_mgc, modfs) - _hi_band_db(gen_mgc, modfs))
    gv = float(np.mean(global_variance(gen_mgc))
               / max(np.mean(global_variance(nat_mgc)), 1e-30))
    return {"modspec_hi_band_deficit_db": round(deficit, 3),
            "gv_ratio": round(gv, 4),
            "test_mcd_db": round(float(np.mean(mcds)), 4)}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", default="/tmp/gantts_sweep")
    p.add_argument("--points", default="",
                   help="comma list of point names (default: all)")
    p.add_argument("--num-utts", type=int, default=100, dest="num_utts",
                   help="corpus size (utterances); points measured at "
                        "different sizes are suffixed @N in the output")
    p.add_argument("--out", default=join(REPO, "docs", "tts_gan_sweep.json"))
    args = p.parse_args()
    n = args.num_utts
    root = join(args.root, f"n{n}") if n != 100 else args.root
    os.makedirs(root, exist_ok=True)
    suffix = f"@{n}" if n != 100 else ""

    corpus = join(root, f"slt{n}")
    data = join(root, "data")
    if not os.path.isdir(corpus):
        from tests.fixtures import make_tts_corpus
        make_tts_corpus(corpus, num=n)
    if not exists(join(data, "X_acoustic")):
        sh([sys.executable, join(REPO, "prepare_features_tts.py"), corpus,
            f"--dst_dir={data}"], cwd=root)

    shared = join(root, "ckpt", "shared")
    base_ck = join(shared, "baseline")
    gw_ck = join(shared, "gwarm")
    if not exists(join(base_ck, f"checkpoint_epoch{EPOCHS}_Generator.pth")):
        shutil.rmtree(base_ck, ignore_errors=True)
        sh(train_cmd(data, base_ck, EPOCHS, w_d=0, mge_w=1.0), cwd=root)
    if not exists(join(gw_ck, f"checkpoint_epoch{G_WARMUP}_Generator.pth")):
        shutil.rmtree(gw_ck, ignore_errors=True)
        sh(train_cmd(data, gw_ck, G_WARMUP, w_d=0, mge_w=1.0), cwd=root)

    results = {}
    if exists(args.out):
        with open(args.out) as f:
            results = json.load(f)
    # stamp the fixture revision that generated the corpus so provenance
    # drift is detectable (round-4 VERDICT item 7: the checked-in TTS rows
    # had outlived the fixture code that produced them)
    fix_rev = subprocess.run(
        ["git", "hash-object", join(REPO, "tests", "fixtures.py")],
        capture_output=True, text=True).stdout.strip()
    prov = results.setdefault("_provenance", {})
    if prov.get("fixtures_blob") not in (None, fix_rev):
        print(f"NOTE: fixtures.py changed ({prov['fixtures_blob'][:10]} -> "
              f"{fix_rev[:10]}); older points in {args.out} were measured "
              "on a different corpus (each point carries its own "
              "fixtures_blob stamp)", file=sys.stderr)
    prov["fixtures_blob"] = fix_rev
    prov["corpus"] = "tests/fixtures.py make_tts_corpus (speech-like, " \
        "articulation_scatter=0.06 + per-utterance speaker scatter)"
    results["baseline" + suffix] = {
        **eval_acoustic(
            join(base_ck, f"checkpoint_epoch{EPOCHS}_Generator.pth"), data),
        "train_mcd_db": final_scalar(join(base_ck, "log"),
                                     "train mcd metric"),
        # per-point stamp: survives later partial reruns (the top-level
        # _provenance.fixtures_blob only describes the LATEST run)
        "fixtures_blob": fix_rev,
    }
    print("baseline%s:" % suffix,
          json.dumps(results["baseline" + suffix]))

    wanted = [s for s in args.points.split(",") if s]
    for name, knobs in POINTS:
        if wanted and name not in wanted:
            continue
        nepoch = knobs.get("nepoch", EPOCHS)
        d_warm = knobs["d_warmup"]
        # keep weight_decay at the bundle default: dropping it changes
        # the optax chain length and the G-warmup checkpoint's
        # optimizer state no longer deserializes
        parts = []
        g_lr = knobs.get("lr", knobs.get("g_lr"))
        d_lr = knobs.get("lr", knobs.get("d_lr"))
        if g_lr is not None:
            parts.append(f"optimizer_g_params={{'lr': {g_lr}, "
                         f"'weight_decay': 1e-7}}")
        if d_lr is not None:
            parts.append(f"optimizer_d_params={{'lr': {d_lr}, "
                         f"'weight_decay': 1e-7}}")
        extra = ",".join(parts)
        pdir = join(root, "ckpt", f"p_{name}", "gan")
        final_g = join(pdir, f"checkpoint_epoch{nepoch}_Generator.pth")
        if not exists(final_g):
            shutil.rmtree(pdir, ignore_errors=True)
            os.makedirs(pdir)
            for kind in ("Generator", "Discriminator"):
                src = join(gw_ck, f"checkpoint_epoch{G_WARMUP}_{kind}.pth")
                if exists(src):
                    shutil.copy(src, pdir)
            g8 = join(pdir, f"checkpoint_epoch{G_WARMUP}_Generator.pth")
            sh(train_cmd(data, pdir, d_warm, extra, checkpoint_g=g8,
                         discriminator_warmup=True, w_d=1.0,
                         restart_epoch=0), cwd=root)
            sh(train_cmd(
                data, pdir, nepoch, extra, checkpoint_g=g8,
                checkpoint_d=join(
                    pdir, f"checkpoint_epoch{d_warm}_Discriminator.pth"),
                reset_optimizers=True, restart_epoch=G_WARMUP,
                w_d=knobs["w_d"]), cwd=root)
        results[name + suffix] = {
            "knobs": knobs,
            **eval_acoustic(final_g, data, extra),
            "train_mcd_db": final_scalar(join(pdir, "log"),
                                         "train mcd metric"),
            "fixtures_blob": fix_rev,
        }
        base_def = results[
            "baseline" + suffix]["modspec_hi_band_deficit_db"]
        results[name + suffix]["deficit_ratio_vs_baseline"] = round(
            results[name + suffix]["modspec_hi_band_deficit_db"]
            / base_def, 3)
        print(name + suffix, json.dumps(results[name + suffix]))
        os.makedirs(dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
            f.write("\n")
    print("wrote", args.out)


if __name__ == "__main__":
    main()
