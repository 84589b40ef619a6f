import os, subprocess, sys
from tests.test_realistic import H1, H2, ENV, ROOT

def test_dbg2():
    got = subprocess.run(
        [sys.executable, "-m", "pandaseq_tpu.cli.main",
         "-f", H1, "-r", H2, "-A", "stitch"],
        capture_output=True, env=ENV, cwd=ROOT, timeout=300)
    open("/tmp/dbg2.fa", "wb").write(got.stdout)
    open("/tmp/dbg2env.txt", "w").write("\n".join(f"{k}={v}" for k, v in sorted(ENV.items())))
