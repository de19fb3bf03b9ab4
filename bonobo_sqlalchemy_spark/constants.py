"""Operation tokens gating sink behavior.

Reference parity: ``bonobo_sqlalchemy/constants.py:3-5`` defines sentinel
``Token('Select'/'Insert'/'Update')`` objects used to gate which operations
``InsertOrUpdate`` may perform. Here they are a proper enum.
"""

from __future__ import annotations

import enum


class Operation(enum.Enum):
    SELECT = "select"
    INSERT = "insert"
    UPDATE = "update"

    def __repr__(self) -> str:  # mirror the reference's readable token repr
        return f"<{self.name}>"


#: Module-level aliases matching the reference public names
#: (``bonobo_sqlalchemy.constants.INSERT`` etc.).
SELECT = Operation.SELECT
INSERT = Operation.INSERT
UPDATE = Operation.UPDATE
