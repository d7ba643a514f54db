"""CLI mirroring the reference ``gbdc <tool> <file>`` (Main.cc:46-203).

    python -m gbdc_spark.cli <tool> <file> [-o out] [-t sec] [-m MB] [-f MB]

Tools: id/identify, gbdhash, isohash, opbhash, pqbfhash, wcnfhash,
normalize, sanitize, checksani, cnf2kis, extract, gates.
Extension sniffing (incl. the double extension under .xz/.gz/...) picks
the domain exactly like Main.cc:105-125; `extract`/`gates` print
``name=value`` lines (Main.cc:166-189); limit violations exit 1
(Main.cc:205-221).
"""

from __future__ import annotations

import argparse
import os
import sys

from . import api
from .kernels import tokens as _tokens
from .kernels import transforms as _transforms

TOOLS = [
    "id", "identify", "gbdhash", "isohash", "opbhash", "pqbfhash", "wcnfhash",
    "normalize", "sanitize", "checksani", "cnf2kis", "extract", "gates",
]


def _domain_ext(filename: str) -> str:
    base, ext = os.path.splitext(filename)
    if ext.lower() in (".xz", ".lzma", ".bz2", ".gz"):
        ext = os.path.splitext(base)[1]
    return ext.lower()


def _fmt(v: float) -> str:
    # C++ `std::cout << double` default: 6 significant digits
    return f"{v:.6g}"


def _print_record(names, values) -> None:
    for n, v in zip(names, values):
        print(f"{n}={_fmt(v)}")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="gbdc")
    ap.add_argument("tool", choices=TOOLS)
    ap.add_argument("file")
    ap.add_argument("-o", "--output", default="-")
    ap.add_argument("-t", "--timeout", type=int, default=0, help="CPU seconds")
    ap.add_argument("-m", "--memout", type=int, default=0, help="MB")
    ap.add_argument("-f", "--fileout", type=int, default=0, help="MB")
    args = ap.parse_args(argv)

    tool, fn = args.tool, args.file
    ext = _domain_ext(fn)

    if tool in ("id", "identify"):
        if ext in (".cnf", ".wecnf"):
            print("Detected CNF, using CNF hash", file=sys.stderr)
            print(api.gbdhash(fn))
        elif ext == ".opb":
            print("Detected OPB, using OPB hash", file=sys.stderr)
            print(api.opbhash(fn))
        elif ext in (".qcnf", ".qdimacs"):
            print("Detected QBF, using QBF hash", file=sys.stderr)
            print(api.pqbfhash(fn))
        elif ext == ".wcnf":
            print("Detected WCNF, using WCNF hash", file=sys.stderr)
            print(api.wcnfhash(fn))
    elif tool == "gbdhash":
        print(api.gbdhash(fn))
    elif tool == "isohash":
        if ext == ".cnf":
            print(api.isohash(fn))
        elif ext == ".wcnf":
            print(api.wcnfisohash(fn))
    elif tool == "opbhash":
        print(api.opbhash(fn))
    elif tool == "pqbfhash":
        print(api.pqbfhash(fn))
    elif tool == "wcnfhash":
        print(api.wcnfhash(fn))
    elif tool == "normalize":
        print(f"Normalizing {fn}", file=sys.stderr)
        toks = _tokens.tokenize_dimacs(api.read_text(fn))
        n_vars, n_clauses = _transforms.determine_counts(toks)
        print(f"p cnf {n_vars} {n_clauses}")
        cur: list[str] = []
        for t in toks.tolist():
            if t == 0:
                print(" ".join(cur) + " 0" if cur else "0")
                cur = []
            else:
                cur.append(str(t))
    elif tool == "sanitize":
        if not api.sanitize(fn, args.timeout, args.memout):
            return 1
    elif tool == "checksani":
        toks = _tokens.tokenize_dimacs(api.read_text(fn))
        if not _transforms.check_sanitized(toks):
            print(f"{fn} needs sanitization", file=sys.stderr)
    elif tool == "cnf2kis":
        print(f"Generating Independent Set Problem {fn}", file=sys.stderr)
        out = args.output if args.output != "-" else fn + ".kis"
        res = api.cnf2kis(fn, out, rlim=args.timeout, mlim=args.memout, flim=args.fileout)
        if res.get("hash") in ("timeout", "memout", "fileout"):
            return 1
        if args.output == "-":
            with open(out) as f:
                sys.stdout.write(f.read())
            os.unlink(out)
    elif tool == "extract":
        if ext == ".cnf":
            print("Detected CNF, extracting CNF base features", file=sys.stderr)
            rec = api.extract_base_features(fn, args.timeout, args.memout)
            names = api.base_feature_names()[1:]
        elif ext == ".wcnf":
            print("Detected WCNF, extracting WCNF base features", file=sys.stderr)
            rec = api.extract_wcnf_base_features(fn, args.timeout, args.memout)
            names = api.wcnf_base_feature_names()[1:]
        elif ext == ".opb":
            print("Detected OPB, extracting OPB base features", file=sys.stderr)
            rec = api.extract_opb_base_features(fn, args.timeout, args.memout)
            names = api.opb_base_feature_names()[1:]
        else:
            return 0
        if isinstance(rec.get("base_features_runtime"), str):
            return 1
        _print_record(names, [rec[n] for n in names])
    elif tool == "gates":
        rec = api.extract_gate_features(fn, args.timeout, args.memout)
        if isinstance(rec.get("gate_features_runtime"), str):
            return 1
        names = api.gate_feature_names()[1:]
        _print_record(names, [rec[n] for n in names])
    return 0


if __name__ == "__main__":
    sys.exit(main())
