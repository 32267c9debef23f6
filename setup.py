"""Build config for the native C extension(s).

The _pyhashx extension provides the bit-exact FNV/murmur/xx hashes the data
layer and evaluation seeding depend on (reference: vendored pyhash-0.9.3).
It is optional at install time — mode_diffusion_policy_tpu.utils.hashing
falls back to a pure-Python implementation when the extension is absent.

Build in place with:  python setup.py build_ext --inplace
"""
from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            "mode_diffusion_policy_tpu.native._pyhashx",
            sources=["mode_diffusion_policy_tpu/native/pyhashx/pyhashx.c"],
            extra_compile_args=["-O3"],
            optional=True,
        ),
    ],
)
