"""Applied-field sources.

Every source here returns a :class:`superscreen_tpu.parameter.Parameter`
evaluating ``H_z(x, y, z)`` at mesh sites.  Unlike the reference
implementations (numba-jitted host loops), each is written as a closed-form
vectorized expression over the full coordinate array so a solve can trace
it straight into the jitted device program: constants broadcast, dipole
fields batch over the dipole axis on the MXU, and the Pearl vortex goes
through a device FFT (``ops/fft_coupling`` machinery) rather than a
quadrature loop.

API parity: reference ``superscreen/sources/__init__.py``.
"""

from .constant import ConstantField
from .current import SheetCurrentField, biot_savart_2d
from .dipole import DipoleField, dipole_distribution, dipole_field
from .vortex import (
    MonopoleField,
    PearlVortexField,
    VortexField,
    monopole,
    pearl_vortex,
)
