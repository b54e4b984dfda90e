"""Build hook: compile the native symbolic engine into the package.

The reference builds its native ordering layer via AMD/Lib/Makefile +
COLAMD/Lib/Makefile before SLIP_LU/Lib/Makefile (SURVEY.md section 1);
here the equivalent C++ engine (native/slip_symbolic.cpp + slip_amd.cpp +
slip_schedule.cpp) is compiled by `make -C native` and shipped as package
data so non-editable installs keep the native orderings. If g++ is absent
the build still succeeds — ordering/native.py falls back to the pure
Python orderings (with a loud warning at scale).
"""

import os
import shutil
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py

ROOT = os.path.dirname(os.path.abspath(__file__))


class BuildWithNative(build_py):
    def run(self):
        native = os.path.join(ROOT, "native")
        so = os.path.join(native, "libslip_symbolic.so")
        if os.path.exists(os.path.join(native, "Makefile")):
            subprocess.run(["make", "-C", native], check=False)
        if os.path.exists(so):
            shutil.copy2(so, os.path.join(
                ROOT, "slip_lu_tpu", "ordering", "libslip_symbolic.so"))
        super().run()


setup(cmdclass={"build_py": BuildWithNative})
