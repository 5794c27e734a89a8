"""DER table over the full synthetic diarization harness (VERDICT r4 #7).

Runs every stress case — tones, formant pseudo-speech with breaths/overlap/
music, reverb (synthetic RIR), narrowband channel, additive noise, 4 and 5
speakers — through tools.speaker_tools.diarize with the random-init speaker
encoder, and prints a markdown table (pasted into README's "Tool quality
baselines") plus one JSON line. The DER tests assert these numbers with
margin (tests/test_diarization_der.py).

Run: python scripts/der_table.py            (CPU-only, ~minutes)
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
# force CPU: this is a determinism-sensitive quality harness (and the deep
# encoder would otherwise compile per batch shape over the remote tunnel).
# NOTE: os.environ["JAX_PLATFORMS"]="cpu" is NOT enough on hosts whose
# accelerator ships as a jax plugin — the plugin registration overrides it
# (measured: the process still initialized the tunneled TPU backend and
# wedged on a down tunnel). jax.config.update before first backend use is
# authoritative.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def cases():
    from formant_speech import build_conversation

    two = [(0, 3.0), (1, 2.5), (0, 2.5), (1, 3.0), (0, 2.0), (1, 2.5)]
    three = [(0, 3.0), (1, 2.5), (0, 2.0), (2, 3.5), (1, 3.0), (2, 2.0),
             (0, 2.5)]
    four = [(0, 3.0), (1, 2.5), (2, 3.0), (3, 2.5), (0, 2.0), (2, 2.5),
            (1, 3.0), (3, 2.0)]
    five = four + [(4, 3.0), (0, 2.0), (4, 2.5)]
    yield ("formant 2spk + breaths",
           build_conversation(two, with_breaths=True, seed=1))
    yield ("formant 3spk",
           build_conversation(three, with_breaths=True, seed=3))
    yield ("overlap + music",
           build_conversation(two[:5], overlap_pairs=(1,), music_level=0.015,
                              with_breaths=True, seed=2))
    yield ("reverb rt60=0.4",
           build_conversation(two, with_breaths=True, seed=4, rt60=0.4))
    yield ("narrowband (tel)",
           build_conversation(two, with_breaths=True, seed=5, channel="tel"))
    yield ("noise SNR 10 dB",
           build_conversation(two, with_breaths=True, seed=6, snr_db=10.0))
    yield ("reverb + noise 15 dB",
           build_conversation(three, with_breaths=True, seed=7, rt60=0.3,
                              snr_db=15.0))
    yield ("4 speakers",
           build_conversation(four, with_breaths=True, seed=8))
    yield ("5 speakers",
           build_conversation(five, with_breaths=True, seed=9))


def main():
    from xva_trainer_tpu.models.speaker_encoder import SpeakerEncoder
    from xva_trainer_tpu.tools.der import der
    from xva_trainer_tpu.tools.speaker_tools import diarize

    enc = SpeakerEncoder()
    rows, report = [], {}
    for name, (y, ref) in cases():
        hyp = diarize(np.asarray(y), 22050, enc)
        m = der(ref, hyp)
        k = len({t["speaker"] for t in hyp})
        rows.append((name, m, k, len({t['speaker'] for t in ref})))
        report[name] = {"der": round(m["der"], 3),
                        "missed": round(m["missed"], 3),
                        "false_alarm": round(m["false_alarm"], 3),
                        "confusion": round(m["confusion"], 3),
                        "speakers_found": k}
        print(f"[der_table] {name}: {report[name]}", flush=True)

    print("\n| Case | DER | Miss | FA | Conf | spk found/true |")
    print("|---|---|---|---|---|---|")
    for name, m, k, ktrue in rows:
        print(f"| {name} | {m['der']:.2f} | {m['missed']:.2f} | "
              f"{m['false_alarm']:.2f} | {m['confusion']:.2f} | {k}/{ktrue} |")
    print(json.dumps(report))


if __name__ == "__main__":
    main()
