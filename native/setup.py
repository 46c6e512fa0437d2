"""Build the native extensions in-place:

    python native/setup.py build_ext --inplace

Places assistedmanipulation_tpu/_fastlog.*.so next to the package; the
logging layer picks it up automatically and falls back to pure Python when
absent (logging/csv_logger.py).
"""

import os

from setuptools import Extension, setup

HERE = os.path.dirname(os.path.abspath(__file__))

setup(
    name="assistedmanipulation_tpu_native",
    version="0.1",
    packages=[],
    ext_modules=[
        Extension(
            "assistedmanipulation_tpu._fastlog",
            sources=[os.path.join(HERE, "fastlog.c")],
            extra_compile_args=["-O2"],
        )
    ],
    script_args=None,
)
