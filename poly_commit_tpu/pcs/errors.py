"""Error types mirroring the reference's 20-variant enum (error.rs:6-143)."""

from __future__ import annotations


class PCError(Exception):
    """Base class for polynomial-commitment errors."""


class MissingPolynomial(PCError):
    pass


class MissingEvaluation(PCError):
    pass


class MissingLHSEval(PCError):
    """Evaluation of a linear combination's LHS is missing (error.rs)."""


class DegreeIsZero(PCError):
    pass


class TooManyCoefficients(PCError):
    def __init__(self, num_coefficients, num_powers):
        super().__init__(
            f"the number of coefficients ({num_coefficients}) exceeds the "
            f"supported powers ({num_powers})"
        )


class HidingBoundIsZero(PCError):
    pass


class HidingBoundToolarge(PCError):
    def __init__(self, hiding_poly_degree, num_powers):
        super().__init__(
            f"hiding bound produced degree {hiding_poly_degree} but only "
            f"{num_powers} powers are available"
        )


class TrimmingDegreeTooLarge(PCError):
    pass


class EmptyDegreeBounds(PCError):
    pass


class EquationHasDegreeBounds(PCError):
    pass


class UnsupportedDegreeBound(PCError):
    def __init__(self, bound):
        super().__init__(f"degree bound {bound} is not supported by the key")


class IncorrectDegreeBound(PCError):
    def __init__(self, poly_degree, degree_bound, supported_degree, label=""):
        super().__init__(
            f"polynomial {label!r} of degree {poly_degree} violates its degree "
            f"bound {degree_bound} (supported degree {supported_degree})"
        )


class IncorrectInputLength(PCError):
    pass


class InvalidNumberOfVariables(PCError):
    pass


class PolynomialDegreeTooLarge(PCError):
    def __init__(self, poly_degree, supported_degree, label=""):
        super().__init__(
            f"polynomial {label!r} has degree {poly_degree} but the key "
            f"supports degree {supported_degree}"
        )


class InvalidParameters(PCError):
    pass


class MissingRng(PCError):
    """Hiding commitment requested without randomness (optional_rng.rs:10-50)."""


class TranscriptError(PCError):
    pass


class InvalidCommitment(PCError):
    pass


class HashingError(PCError):
    pass
