#!/usr/bin/env python3
"""Regenerate every golden file under tests/golden/javaref/ from the
COMPILED REFERENCE SYSTEM (tools/javaref/build.sh + javaref.Driver).

Must be run whenever a shared semantic changes on both sides of the
parity boundary (e.g. the vendored wnlin lexical database): the goldens
are the reference's own stdout, so they move together with the stubs.

Usage:  python tools/regen_goldens.py [--only MODE[,MODE...]]

Modes: temprel causal features taskc dense writetml tempmark causmark
       connmark entmark verbmark adv
"""
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
GOLD = os.path.join(REPO, "tests", "golden", "javaref")
CLASSES = "/tmp/javaref_classes"
EXAMPLES = [os.path.join(REF, "data/example_TXP", f)
            for f in ("bbc_20130322_721.tml.txp", "wsj_1014.tml.txp")]

sys.path.insert(0, REPO)


def build():
    subprocess.run([os.path.join(REPO, "tools/javaref/build.sh")],
                   check=True)


def write_synth_docs(tmp, n):
    from erex.corpus import generate_txp
    paths = []
    for i in range(n):
        p = os.path.join(tmp, f"doc_{i}.txp")
        with open(p, "w") as f:
            f.write(generate_txp(i))
        paths.append(p)
    return paths


def run_driver(mode, paths, extra_pre=None):
    """Run javaref.Driver <mode> over paths (cwd = reference checkout so
    ./resource and ./models resolve); returns stdout."""
    cmd = ["java", "-cp", f"{CLASSES}:{REF}/lib/*",
           f"-Derex.wnlin.dir={REPO}/erex/resources/wnlin",
           "javaref.Driver", mode]
    if extra_pre:
        cmd += extra_pre
    out = []
    # chunk: the synthetic corpus is 200 files; one JVM per ~50 keeps the
    # command line short and memory flat
    for i in range(0, len(paths), 50):
        r = subprocess.run(cmd + paths[i:i + 50], cwd=REF, check=True,
                           capture_output=True, text=True)
        out.append(r.stdout)
    return "".join(out)


def save(name, text):
    with open(os.path.join(GOLD, name), "w") as f:
        f.write(text)
    print(f"  {name}: {text.count(chr(10))} rows")


def main():
    only = None
    if len(sys.argv) > 2 and sys.argv[1] == "--only":
        only = set(sys.argv[2].split(","))

    def want(m):
        return only is None or m in only

    build()
    with tempfile.TemporaryDirectory() as tmp:
        docs200 = write_synth_docs(tmp, 200)
        docs50 = docs200[:50]
        docs2 = docs200[:2]

        if want("temprel"):
            save("synth_temprel.tsv", run_driver("temprel", docs200))
            save("example_temprel.tsv", run_driver("temprel", EXAMPLES))
        if want("causal"):
            save("synth_causal.tsv", run_driver("causal", docs200))
            save("example_causal.tsv", run_driver("causal", [EXAMPLES[1]]))
        if want("features"):
            save("synth_features_doc01.tsv", run_driver("features", docs2))
        if want("taskc"):
            save("taskc_synth.tsv", run_driver(
                "taskc", docs200,
                extra_pre=[os.path.join(GOLD, "synth_causal.tsv")]))
            save("taskc_example.tsv", run_driver(
                "taskc", EXAMPLES,
                extra_pre=[os.path.join(GOLD, "example_causal.tsv")]))
        if want("dense"):
            save("dense_synth.tsv", run_driver("dense", docs200))
            save("dense_example.tsv", run_driver("dense", EXAMPLES))
            save("densefeat_synth.tsv", run_driver("densefeat", docs2))
        if want("writetml"):
            outdir = os.path.join(GOLD, "systml")
            os.makedirs(outdir, exist_ok=True)
            for p in EXAMPLES:
                stem = os.path.basename(p)[:-len(".tml.txp")]
                tml = f"{REF}/data/example_TML/{stem}.tml"
                run_driver("writetml", [tml, outdir], extra_pre=[p])
                print(f"  systml/{stem}.tml")
        for mode in ("tempmark", "causmark", "connmark", "entmark",
                     "verbmark"):
            if want(mode):
                save(f"{mode}_synth.tsv", run_driver(mode, docs50))
                save(f"{mode}_example.tsv", run_driver(mode, EXAMPLES))
        if want("adv"):
            # adversarial corpora: the generator scripts write the .txp
            # docs under tests/golden/javaref/adv/, then the Driver
            # produces the matching golden rows
            advdir = os.path.join(GOLD, "adv")
            for script in ("adversarial_causal", "adversarial_tempsig",
                           "adversarial_connective"):
                subprocess.run([sys.executable,
                                os.path.join(REPO, "tools",
                                             script + ".py"), advdir],
                               check=True, cwd=REPO,
                               env={**os.environ, "PYTHONPATH": REPO})
            import glob
            cadv = sorted(glob.glob(os.path.join(advdir, "adv*.txp")))
            tadv = sorted(glob.glob(os.path.join(advdir, "tadv*.txp")))
            cnadv = sorted(glob.glob(os.path.join(advdir, "cadv*.txp")))
            if cadv:
                save("causmark_adv.tsv", run_driver("causmark", cadv))
            if tadv:
                save("tempmark_adv.tsv", run_driver("tempmark", tadv))
            if cnadv:
                save("connmark_adv.tsv", run_driver("connmark", cnadv))


if __name__ == "__main__":
    main()
