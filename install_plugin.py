"""Register recipe/visgui modules with a PYME installation, if present.

Counterpart of the reference's install_plugin.py (copies module lists
into PYME's config dir so PYMEVis auto-discovers them,
reference install_plugin.py:6-13).  Our modules work standalone; this
script only matters when PYME is installed alongside.
"""

import os
import sys


RECIPE_MODULES = "ch_shrinkwrap_tpu.recipes.surface_fitting\n" \
                 "ch_shrinkwrap_tpu.recipes.simulation\n" \
                 "ch_shrinkwrap_tpu.recipes.surface_feature_extraction\n"
VISGUI_MODULES = "ch_shrinkwrap_tpu.visgui_modules.shrinkwrap\n" \
                 "ch_shrinkwrap_tpu.visgui_modules." \
                 "surface_feature_extraction\n"


def main():
    try:
        from PYME import config
    except ImportError:
        print('PYME is not installed; ch_shrinkwrap_tpu works standalone '
              '(recipes via ch_shrinkwrap_tpu.recipes.Recipe). Nothing '
              'to register.')
        return 0

    conf_dir = config.user_config_dir
    for sub, content in (('plugins/recipes', RECIPE_MODULES),
                         ('plugins/visgui', VISGUI_MODULES)):
        d = os.path.join(conf_dir, sub)
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, 'ch_shrinkwrap_tpu.txt')
        with open(path, 'w') as fh:
            fh.write(content)
        print('registered', path)
    return 0


if __name__ == '__main__':
    sys.exit(main())
