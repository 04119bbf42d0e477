"""
Polyphase solver components (import-path parity with
whatshap.polyphase.solver, which wraps the reference's C++).
"""

from .switchflip import SwitchFlipCalculator

__all__ = ["SwitchFlipCalculator"]
