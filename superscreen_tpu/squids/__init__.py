from .susceptometer import (
    SQUID_PRESETS,
    SusceptometerGeometry,
    loop_with_leads,
    make_squid,
    squid_mutual_inductance,
)
