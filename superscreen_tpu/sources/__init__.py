from .constant import ConstantField
from .current import SheetCurrentField, biot_savart_2d
from .dipole import DipoleField, dipole_distribution, dipole_field
from .vortex import MonopoleField, PearlVortexField, VortexField, monopole, pearl_vortex
