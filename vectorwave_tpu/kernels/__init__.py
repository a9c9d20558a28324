from .modwt_pallas import (
    fused_analysis,
    fused_synthesis,
    pallas_available,
)

__all__ = ["fused_analysis", "fused_synthesis", "pallas_available"]
