#!/usr/bin/env python
"""Run the five BASELINE configs through their demo curricula and pin the
quality numbers into RESULTS.md + results.json (VERDICT round-2 item 5).

Configs (BASELINE.json):
  #1 VC In2OutHighwayNet, MGE-only baseline      } vc_demo.sh
  #2 VC In2OutHighwayNet, 5-stage GAN curriculum }
  #3 TTS duration model (MGE)                    } tts_demo.sh
  #4 TTS acoustic, MGE-only baseline             }
  #5 TTS acoustic, adversarial                   }

The corpora are the synthetic speech-like fixtures the demo e2e tests use
(tests/fixtures.py) at a larger scale, run through the SHIPPED demo shell
scripts (vc_demo.sh / tts_demo.sh -> train_gan.sh -> evaluation_*), so the
dossier exercises the exact pipelines a user runs.  Recorded per config:
final train/test distortions (from the per-stage scalars.jsonl that
train_gan.sh now writes next to each checkpoint dir) and, for the eval
outputs, the GV ratio and high-band modulation-spectrum delta vs natural
(analysis.json) — the baseline-vs-GAN comparison the reference publishes as
notebook plots.

usage:
    python tools/quality_dossier.py [--root /tmp/dossier] [--quick]
        [--out-json results.json] [--out-md RESULTS.md]

tests/test_results_dossier.py regression-gates the checked-in results.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from os.path import dirname, join

import numpy as np

REPO = dirname(dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def read_series(jsonl_path, tag):
    vals = []
    with open(jsonl_path) as f:
        for line in f:
            row = json.loads(line)
            if row["tag"] == tag:
                vals.append((row["step"], row["value"]))
    return vals


def final(jsonl_path, tag):
    series = read_series(jsonl_path, tag)
    return round(float(series[-1][1]), 4) if series else None


def run(cmd, cwd, env_extra, timeout=14400):
    env = dict(os.environ, **env_extra)
    t0 = time.time()
    r = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True,
                       text=True, timeout=timeout)
    if r.returncode != 0:
        raise RuntimeError(
            f"{cmd} failed:\n{r.stdout[-2000:]}\n{r.stderr[-4000:]}")
    return time.time() - t0


def analysis_summary(analysis_path):
    with open(analysis_path) as f:
        rep = json.load(f)
    out = {"gv_ratio": round(rep.get("gv_ratio", float("nan")), 4)}
    g = rep.get("modspec_generated_hi_band_db")
    n = rep.get("modspec_natural_hi_band_db")
    if g is not None and n is not None:
        out["modspec_hi_band_deficit_db"] = round(n - g, 3)
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", default="/tmp/gantts_dossier")
    p.add_argument("--quick", action="store_true",
                   help="tiny epochs/corpus (smoke only, numbers meaningless)")
    p.add_argument("--only", choices=["vc", "tts", "all"], default="all",
                   help="rerun one half; the other half's rows are kept "
                        "from the existing --out-json")
    p.add_argument("--n-tts", type=int, default=250, dest="n_tts",
                   help="TTS corpus size (utterances); 250 is where the "
                        "adversarial stage has enough data to shape the "
                        "hi-band without wrecking MCD "
                        "(docs/tts_gan_sweep.json)")
    p.add_argument("--adv-hparams", default="", dest="adv_hparams",
                   help="extra hparams for the GAN stages only "
                        "(train_gan.sh ADV_HPARAMS, e.g. a gentler "
                        "stage-5 lr)")
    p.add_argument("--w-d", default="0.2", dest="w_d",
                   help="stage-5 adversarial weight (train_gan.sh W_D). "
                        "Default 0.2: measured through THIS pipeline "
                        "(full two-stage synthesis + waveform "
                        "re-analysis) it passes every dossier gate with "
                        "margin — deficit ratio 0.776, MCD x1.24, GV "
                        "0.99->1.02 (docs/tts_gan_sweep.json "
                        "dossier_* rows; w_d=0.3 measured x1.38 on the "
                        "dossier operator, over the x1.35 blow-up gate; "
                        "the reference's production w_d=1.0 needs "
                        "slt_arctic-scale data)")
    p.add_argument("--out-json", default=join(REPO, "results.json"))
    p.add_argument("--out-md", default=join(REPO, "RESULTS.md"))
    args = p.parse_args()

    from tests.fixtures import make_arctic_vc_corpus, make_tts_corpus

    root = args.root
    os.makedirs(root, exist_ok=True)
    if args.quick:
        n_vc, n_tts = 12, 10
        vc_env = dict(MAX_FILES=str(n_vc), TOTAL_EPOCH="3", G_WARMUP="1",
                      D_WARMUP="1")
        tts_env = dict(DURATION_EPOCHS="3", ACOUSTIC_EPOCHS="3",
                       G_WARMUP="1", D_WARMUP="1")
    else:
        n_vc, n_tts = 40, args.n_tts
        vc_env = dict(MAX_FILES=str(n_vc), TOTAL_EPOCH="40", G_WARMUP="10",
                      D_WARMUP="5")
        # batch_size=8 (vs the production 20): the synthetic corpus is small
        # enough that batch 20 gives ~2 optimizer steps/epoch, and Adagrad's
        # sign-like first steps (update == +-lr/coord while the accumulator
        # is empty — torch-identical, gantts_tpu/train/optim.py) then need
        # more steps than the curriculum has to re-converge the deep SRU
        # stack.  ~12 steps/epoch matches the reference demo's step budget
        # (slt_arctic: 1132 utts / batch 20 ~= 56 steps/epoch) at dossier
        # scale; measured: batch 20 leaves train MCD ~5.4 dB and the GAN
        # stage diverges, batch 8/corpus 100 converges cleanly.
        tts_env = dict(DURATION_EPOCHS="30", ACOUSTIC_EPOCHS="30",
                       G_WARMUP="8", D_WARMUP="4",
                       HPARAMS_EXTRA="batch_size=8")
    if args.adv_hparams:
        tts_env["ADV_HPARAMS"] = args.adv_hparams
    if args.w_d:
        tts_env["W_D"] = args.w_d

    # corpus dirs are size-suffixed so changing n regenerates; stale
    # checkpoint/log/generated dirs from a previous run are cleared below
    # (ScalarWriter appends, and final() must only see this run's epochs).
    # Both corpora carry per-segment articulation scatter (acoustic
    # variability the inputs do NOT encode) so the MGE baselines genuinely
    # oversmooth — the precondition for the reference's GV-recovery claim
    # (fixtures.py docstrings; round-4 finding in RESULTS.md).
    vc_corpus = join(root, f"arctic{n_vc}_scatter")
    tts_corpus = join(root, f"slt{n_tts}")
    if not os.path.isdir(vc_corpus):
        make_arctic_vc_corpus(vc_corpus, num=n_vc,
                              articulation_scatter=0.06)
    if not os.path.isdir(tts_corpus):
        make_tts_corpus(tts_corpus, num=n_tts)
    import shutil
    stale = []
    if args.only in ("vc", "all"):
        stale += [join(root, "checkpoints", "vc_dossier"),
                  join(root, "generated", "vc_dossier_baseline"),
                  join(root, "generated", "vc_dossier_gan"),
                  join(root, "data", "cmu_arctic_vc_dossier")]
    if args.only in ("tts", "all"):
        stale += [join(root, "checkpoints", "tts_dossier"),
                  join(root, "generated", "tts_dossier_baseline"),
                  join(root, "generated", "tts_dossier_gan"),
                  join(root, "data", "slt_arctic_tts_dossier")]
    for d in stale:
        shutil.rmtree(d, ignore_errors=True)

    results = {"workload": {}}
    if args.only != "all" and os.path.exists(args.out_json):
        with open(args.out_json) as f:
            results = json.load(f)  # keep the half we are not rerunning
    run_vc = args.only in ("vc", "all")
    run_tts = args.only in ("tts", "all")
    # fixture revision stamp, PER HALF: detectable provenance drift (a
    # fixture rewrite invalidates every row measured on the old corpus).
    # A partial --only run must keep the other half's ORIGINAL stamp —
    # overwriting it with the current hash would destroy the very drift
    # evidence the stamp exists to preserve.
    fix_rev = subprocess.run(
        ["git", "hash-object", join(REPO, "tests", "fixtures.py")],
        capture_output=True, text=True).stdout.strip()
    prov = results.setdefault("_provenance", {})
    legacy = prov.pop("fixtures_blob", None)  # pre-round-5 single stamp
    for half, rerun in (("vc", run_vc), ("tts", run_tts)):
        key = f"fixtures_blob_{half}"
        if rerun:
            prov[key] = fix_rev
        elif key not in prov and legacy is not None:
            prov[key] = legacy
    if prov.get("fixtures_blob_vc") != prov.get("fixtures_blob_tts"):
        print(f"WARNING: results.json halves measured on DIFFERENT fixture "
              f"revisions (vc {str(prov.get('fixtures_blob_vc'))[:10]} / "
              f"tts {str(prov.get('fixtures_blob_tts'))[:10]}); rerun with "
              "--only=all to unify", file=sys.stderr)
    if run_vc:
        results["workload"]["vc"] = (
            f"{n_vc} synthetic parallel utterances (tests/fixtures.py "
            f"make_arctic_vc_corpus, articulation_scatter=0.06), "
            f"{vc_env['TOTAL_EPOCH']} epochs")
    if run_tts:
        knobs = "".join(
            f", {k}={tts_env[k]}" for k in ("ADV_HPARAMS", "W_D")
            if k in tts_env)
        results["workload"]["tts"] = (
            f"{n_tts} synthetic labelled utterances (make_tts_corpus, "
            f"speech-like + articulation scatter), "
            f"duration {tts_env['DURATION_EPOCHS']} / acoustic "
            f"{tts_env['ACOUSTIC_EPOCHS']} epochs, batch_size=8" + knobs)
    # importing gantts_tpu first honors GANTTS_TPU_PLATFORM (plain
    # JAX_PLATFORMS can be ignored here — sitecustomize imports jax first)
    import gantts_tpu  # noqa: F401
    import jax

    results["workload"]["device"] = str(jax.devices()[0].platform)

    # ---- VC: configs #1 (baseline) + #2 (GAN) ---------------------------
    if run_vc:
        dt = run(["bash", join(REPO, "vc_demo.sh"), "dossier", vc_corpus],
                 cwd=root, env_extra=vc_env)
        vc_ck = join(root, "checkpoints", "vc_dossier")
        results["vc_in2out_baseline"] = {
            "train_mcd_db": final(join(vc_ck, "baseline/log/scalars.jsonl"),
                                  "train mcd metric"),
            "test_mcd_db": final(join(vc_ck, "baseline/log/scalars.jsonl"),
                                 "test mcd metric"),
            **analysis_summary(join(root, "generated",
                                    "vc_dossier_baseline", "analysis.json")),
        }
        results["vc_in2out_gan"] = {
            "train_mcd_db": final(join(vc_ck, "gan/log/scalars.jsonl"),
                                  "train mcd metric"),
            "test_mcd_db": final(join(vc_ck, "gan/log/scalars.jsonl"),
                                 "test mcd metric"),
            **analysis_summary(join(root, "generated",
                                    "vc_dossier_gan", "analysis.json")),
        }
        results["vc_in2out_gan"]["wall_clock_s_full_demo"] = round(dt, 1)

    # ---- TTS: configs #3 (duration), #4 (baseline ac), #5 (GAN ac) ------
    if run_tts:
        dt = run(["bash", join(REPO, "tts_demo.sh"), "dossier", tts_corpus],
                 cwd=root, env_extra=tts_env)
        tts_ck = join(root, "checkpoints", "tts_dossier")
        results["tts_duration"] = {
            "train_dur_rmse_frames": final(
                join(tts_ck, "duration/baseline/log/scalars.jsonl"),
                "train dur_rmse metric"),
            "test_dur_rmse_frames": final(
                join(tts_ck, "duration/baseline/log/scalars.jsonl"),
                "test dur_rmse metric"),
        }
        for kind, key in (("baseline", "tts_acoustic_baseline"),
                          ("gan", "tts_acoustic_gan")):
            log_p = join(tts_ck, f"acoustic/{kind}/log/scalars.jsonl")
            results[key] = {
                "train_mcd_db": final(log_p, "train mcd metric"),
                "test_mcd_db": final(log_p, "test mcd metric"),
                "test_bap_mcd_db": final(log_p, "test bap_mcd metric"),
                "test_f0_rmse": final(log_p, "test f0_rmse metric"),
                "test_vuv_err": final(log_p, "test vuv_err metric"),
                **analysis_summary(join(root, "generated",
                                        f"tts_dossier_{kind}",
                                        "analysis.json")),
            }
        results["tts_acoustic_gan"]["wall_clock_s_full_demo"] = round(dt, 1)

    with open(args.out_json, "w") as f:
        json.dump(results, f, indent=2)
        f.write("\n")

    # ---- figures + markdown ---------------------------------------------
    # (a fresh --only run has no rows for the other half: render what we
    # have, so the md never crashes after the multi-hour curriculum)
    if run_tts:
        figs = join(dirname(args.out_md), "docs", "dossier")
        try:
            subprocess.run(
                [sys.executable, join(REPO, "tools", "report.py"),
                 join(root, "generated", "tts_dossier_baseline",
                      "analysis.json"),
                 join(root, "generated", "tts_dossier_gan", "analysis.json"),
                 "--labels", "baseline,gan", "--out", figs],
                check=True, capture_output=True, text=True)
        except subprocess.CalledProcessError as e:
            print("figure rendering failed:", e.stderr, file=sys.stderr)

    def row(name, d):
        cells = " | ".join(f"{k} {v}" for k, v in d.items())
        return f"| {name} | {cells} |"

    corpora = "; ".join(results["workload"][k] for k in ("vc", "tts")
                        if k in results["workload"])
    md = ["# RESULTS — quality dossier (demo-scale curricula)",
          "",
          f"Generated by `python tools/quality_dossier.py` on "
          f"`{results['workload']['device']}`; corpora: {corpora}.",
          "",
          "Regression-gated by `tests/test_results_dossier.py`. "
          "The adversarial configs must beat MGE-only on BOTH "
          "oversmoothing measures — cut the high-band "
          "modulation-spectrum deficit vs natural by >=15% and land the "
          "GV ratio at least as close to 1 as the baseline — while "
          "holding test MCD within x1.35 and every absolute distortion "
          "within measured+15% — the reference's notebook-published "
          "claim (GV/modspec recovery without quality collapse), here "
          "as numbers.",
          "",
          "Stage-5 adversarial weight at this corpus scale: `W_D=0.2` "
          "(production default 1.0 needs slt_arctic-scale data; "
          "knob history in `docs/tts_gan_sweep.json`, incl. the "
          "dossier-operator rows that set this default).",
          "",
          "| config | metrics |",
          "|---|---|"]
    for key in ("vc_in2out_baseline", "vc_in2out_gan", "tts_duration",
                "tts_acoustic_baseline", "tts_acoustic_gan"):
        if key in results:
            md.append(row(key, results[key]))
    md += ["",
           "GV / modulation-spectrum comparison figures: "
           "`docs/dossier/gv.png`, `docs/dossier/modspec.png` "
           "(tools/report.py).", ""]
    with open(args.out_md, "w") as f:
        f.write("\n".join(md))
    print(json.dumps(results, indent=2))
    print("wrote", args.out_json, "and", args.out_md)


if __name__ == "__main__":
    main()
