"""Builds the native host library (csrc/cbtd.cpp) into the wheel as a
plain ctypes shared object ``tpcg/libtpcg_host.so`` (tpcg/utils/native.py
loads it with ctypes — no Python C API involved, so the usual PyInit_*
export requirement is suppressed). The extension is marked optional: on a
compiler-less host the wheel still builds and the numpy fallback in
tpcg/utils/native.py serves the same API."""

from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class CTypesExtension(Extension):
    pass


class BuildCTypes(build_ext):
    def get_export_symbols(self, ext):
        if isinstance(ext, CTypesExtension):
            return ext.export_symbols  # no PyInit_* required
        return super().get_export_symbols(ext)

    def get_ext_filename(self, ext_name):
        if ext_name.endswith("libtpcg_host"):
            # plain .so name (no CPython ABI tag) so ctypes.CDLL finds it
            return ext_name.replace(".", "/") + ".so"
        return super().get_ext_filename(ext_name)


ext = CTypesExtension(
    "tpcg.libtpcg_host",
    sources=["csrc/cbtd.cpp"],
    extra_compile_args=["-O3", "-std=c++17", "-fPIC"],
)
ext.optional = True

setup(ext_modules=[ext], cmdclass={"build_ext": BuildCTypes})
