"""CLI experiment driver shim (reference-compatible entry point).

The reference is driven as ``python main.py --pretrain|--train --config_path=X``
(reference ``main.py:9-14``); this file preserves that invocation for source
checkouts. The actual driver lives in :mod:`tpu_slu.cli` so that an installed
package exposes the identical CLI as the ``tpu-slu`` console script.
"""

from tpu_slu.cli import main

if __name__ == "__main__":
    main()
