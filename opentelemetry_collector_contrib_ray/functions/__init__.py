"""Vectorized function library = the OTTL converter set.

Reference: the 44 converters registered at
/root/reference/pkg/ottl/ottlfuncs/functions.go:35-83. Each is a batch
function over Arrow arrays, registered into the expression compiler
(``expr.register_function``) so conditions and transform statements can
call them by name.
"""

from . import converters  # noqa: F401
