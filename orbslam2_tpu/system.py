"""System facade (stub while layers are built bottom-up; completed in frontend milestone)."""
import enum


class Sensor(enum.Enum):
    MONOCULAR = 0
    STEREO = 1
    RGBD = 2


class SLAMSystem:  # pragma: no cover - placeholder
    pass
