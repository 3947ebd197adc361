"""Build the native data-layer extension:

    cd pqmf_tpu/native && python setup.py build_ext --inplace

(or just call ``pqmf_tpu.native.build()``, which invokes the C compiler
directly). Pure C, no external dependencies.
"""

import os

from setuptools import Extension, setup

HERE = os.path.dirname(os.path.abspath(__file__))

setup(
    name="pqmf-wavio",
    ext_modules=[
        Extension(
            "_pqmf_wavio",
            sources=[os.path.join(HERE, "wavio.c")],
            extra_compile_args=["-O3"],
        )
    ],
)
