"""Build the native data-loader core:

    python native/setup.py build_ext --inplace

produces aldi_native.*.so at the repo root; aldi_tpu.data.transforms picks
it up automatically (PIL fallback otherwise).
"""

import os

import numpy as np
from setuptools import Extension, setup

here = os.path.dirname(os.path.abspath(__file__))

setup(
    name="aldi_native",
    ext_modules=[
        Extension(
            "aldi_native",
            sources=[os.path.join(here, "aldi_native.cpp")],
            include_dirs=[np.get_include()],
            libraries=["jpeg", "png"],
            extra_compile_args=["-O3", "-std=c++17"],
        )
    ],
    script_args=["build_ext", "--inplace"],
)
