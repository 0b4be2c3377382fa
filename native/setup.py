"""Build the smallk_tpu native extension:

    python native/setup.py build_ext --inplace

Produces smallk_tpu/native/_native*.so; the framework falls back to pure
Python when absent.
"""

import os
import shutil
import sys

import numpy as np
from setuptools import Extension, setup

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

ext = Extension(
    "_native",
    sources=[os.path.join(HERE, "_native.cpp")],
    include_dirs=[np.get_include()],
    extra_compile_args=["-O3", "-std=c++17", "-Wall"],
    language="c++",
)

if __name__ == "__main__":
    dist = setup(
        name="smallk_tpu_native",
        version="0.1.0",
        ext_modules=[ext],
        script_args=sys.argv[1:] or ["build_ext", "--inplace"],
    )
    # move the built .so into the package
    pkg_native = os.path.join(REPO, "smallk_tpu", "native")
    os.makedirs(pkg_native, exist_ok=True)
    init = os.path.join(pkg_native, "__init__.py")
    if not os.path.exists(init):
        with open(init, "w") as f:
            f.write("")
    for fn in os.listdir("."):
        if fn.startswith("_native") and fn.endswith(".so"):
            shutil.move(fn, os.path.join(pkg_native, fn))
            print(f"installed {fn} -> {pkg_native}")
