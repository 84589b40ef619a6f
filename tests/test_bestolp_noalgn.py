"""A pair that reaches align() but finds no overlap above the score
floor must still log its BESTOLP line with value -1 (assembler.c:139
runs before the bestoverlap == -1 early return) and count as NOALGN;
the whole default-flag stderr stream must match the reference."""

import base64
import re
import subprocess
import sys

from tests.test_oracle_golden import REF_BIN, ROOT, _ensure_ref

# one synthetic MiSeq pair (from make_data.py seed space) whose best
# candidate overlap scores below qual_nn * (flen + rlen)
FWD = base64.b64decode(
    "QE0wMDAwMDo3OjAwMDAwMDAwMC1URVNUMToxOjExMDE6MTAxMjk6MjEyOSAxOk46MDpB"
    "Q0dUQUMKQUNDQUdHQUdUQUdUVEdHR1RBQUNHQUFUQ0dDQUdUQUNBVFRBQVRBQUNDQ1RU"
    "QUdBVFRHVENDR1RUQ0NBR0NDQ1RDVFRBR0FHQVRHR0NDVEdBR0FUQUNHR0FBR0dUR0FB"
    "Q0FHR0FHQVRHQ0NBR0NBQ0NDQUdBQ0dBR0dUQVRBQVRUR0FBQ0FDR0NDQ0FDVEdHQ0dH"
    "VEFDQ0NUVFRDQ1RDR0dHVFRDQUFUVEFDR1RBVEdHR1RUVENBR0FUR0NDR0FBVENDVENH"
    "QUFHQUdDVEdUVENBQ0dBQ0NUQVRDQ0dDR1RHVENUR0FHR0NBQUFHR0NBQVRDR0dBQ0dH"
    "RworCklEQklBRUNISEhCSUk/SUNJREBJQ0lJPkdISUFDSEVDQ0ZDQUFERzpJRENHSUZA"
    "QkNJREJHQj5GSD4+RUlDRERJREZHQkdCRD0/SUNDQUlDRUQ/Qz89REY6Q0Q8Q0BAQUE6"
    "RklDPEQ/QTw8Rj9CQEBAQUhFQj0/Pz5EQEM9O0BCRD4+Oj1HREFFNzxDOD5APz8/QD5D"
    "PEQ9PkFBPkU8QEQ6Qzs8NT8+OTtGPUE5PTo7QzY5QDhBOjU0Njo+PD89Qj89PDw7NT86"
    "Nzc7QD40QDo9OEFAPTk6NTg6MzsvPDg5OjE5Oj46NDo8PDo6OzY6Pjk3OjY5Nzg4PjwK")
REV = base64.b64decode(
    "QE0wMDAwMDo3OjAwMDAwMDAwMC1URVNUMToxOjExMDE6MTAxMjk6MjEyOSAyOk46MDpB"
    "Q0dUQUMKVENHQ0dHQVRDQ0FUQVRBR0FDQUNHQ0NUQVRDQ0NBQ0dHR0FHVFRUR1RUQ0dD"
    "Q1RDQVRDR0dDQ0NDQUdDR0NHQUNDQ0FUVENHVENDR0dBVEFDQUFDVEFDQ1RHQUNBR1RU"
    "QUFUQ0NDQUFDR0FBQ0NBQUdHR0FHR0dHVFRUQUNHR0dDVENHQ1RDR0NHVEFUQ0NBVEFU"
    "VFRHR1RDQUNDVEdUQVRBQ1RHQVRBQ1RUR0dBR0NUR1RUQ0FBVEdDQ0NBQ0FDQ0NHVEdH"
    "VEFHVENDQ0dUQ0NBQVROQUdDVFRDQU5DQ0dBQUNOQUFHVEFHR0dHTkdBR0FUQUFDQ0NH"
    "VAorCkJJRERJRUlJQUdJSUZDRUJBR0lAQ0JDSEhEQUhCQkFCRD5GSUg/SUlHQUNGQEhC"
    "RkdGSUJJSUhBR0VGQ0FFST1DQEJGSUFJREdAP0NDQ0BCRT5GP0NAP0M9RUVHQzhDOkQ8"
    "PUJEQEFJOj5IQT9BQT9CSUc+QD8/PDw6N0E9Rzg/QDxHOUE/PUZEP0E/SDg/Pzo7PkA7"
    "PT1AOkBARkA7Qj08OD1CPTs0PTpDQEc6N0E4QEA7Ozs7Qz5EOUU7Ozw7MDw1Ozg1PT47"
    "Mjg9OTszPT05IyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMK")


def _norm(raw):
    out = []
    for ln in raw.decode(errors="replace").splitlines():
        if re.match(r"^[EWI]\d{4} ", ln):  # absl/XLA process noise
            continue
        ln = re.sub(r"0x[0-9a-f]+:\d+\t", "", ln)
        ln = re.sub(r"STAT\tTIME\t.*", "STAT\tTIME\t<t>", ln)
        ln = re.sub(r"STAT\tELAPSED\t\d+", "STAT\tELAPSED\t<e>", ln)
        if ln.startswith(("INFO\tVER", "INFO\tUNAME", "ARG[",
                          "INFO\tENGINE")):
            continue
        out.append(ln)
    return out


def test_bestolp_minus_one_line(tmp_path):
    _ensure_ref()
    f1 = tmp_path / "n1.fastq"
    f2 = tmp_path / "n2.fastq"
    f1.write_bytes(FWD)
    f2.write_bytes(REV)
    ref = subprocess.run([REF_BIN, "-T", "1", "-f", str(f1), "-r",
                          str(f2)], capture_output=True)
    got = subprocess.run([sys.executable, "-m", "pandaseq_tpu.cli.main",
                          "-T", "1", "-f", str(f1), "-r", str(f2)],
                         capture_output=True, cwd=ROOT)
    assert b"BESTOLP" in ref.stderr and b"\t-1\n" in ref.stderr
    assert b"STAT\tNOALGN\t1" in ref.stderr
    assert got.stdout == ref.stdout
    assert _norm(got.stderr) == _norm(ref.stderr)
