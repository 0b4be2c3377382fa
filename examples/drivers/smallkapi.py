"""Command-line driver for the SmallkAPI class.

Port of reference pysmallk/tests/smallkapi.py: load a matrix, run NMF,
write factors.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from smallk_tpu.api import SmallkAPI  # noqa: E402


def main():
    api = SmallkAPI()
    args = api.parser()
    api.load_matrix(filepath=args.matrixfile)
    api.nmf(
        int(args.k), args.algorithm,
        infile_W=args.infile_W, infile_H=args.infile_H,
        precision=int(args.outprecision), min_iter=int(args.miniter),
        max_iter=int(args.maxiter), tol=float(args.tol),
        max_threads=int(args.maxthreads),
    )
    print("W:", api.get_W().shape, "H:", api.get_H().shape)
    api.finalize()


if __name__ == "__main__":
    main()
