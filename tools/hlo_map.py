"""Map trace fusion names to HLO ops for the donated kiss_icp step.

Compiles the step, dumps optimized HLO, and prints the root expression (and
a few body lines) of each requested fusion/op name.

Usage: python tools/hlo_map.py fusion.4 fusion.5 ... | all
"""

import os
import re
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lis_tpu_tpucache")

import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
jax.config.update("jax_enable_x64", True)

from lab import make_cfg, load_scans, warm_state  # noqa: E402

from lidar_imu_slam_tpu.models import kiss_icp  # noqa: E402


def main():
    import dataclasses
    cfg = make_cfg()
    cfg = cfg.replace(icp=dataclasses.replace(cfg.icp, gn_backend="pallas"))
    scans = load_scans(cfg)
    state = warm_state(cfg, scans, n=2)
    lowered = jax.jit(
        lambda s, sc: kiss_icp.register_frame(s, sc, cfg),
        donate_argnums=(0,),
    ).lower(state, scans[2])
    hlo = lowered.compile().as_text()
    with open("/tmp/step_hlo.txt", "w") as f:
        f.write(hlo)
    names = sys.argv[1:]
    # print the definition line of each fusion + its fused computation root
    for name in names:
        pat = re.compile(rf"%?{re.escape(name)} = .*")
        for m in pat.finditer(hlo):
            line = m.group(0)
            print(f"== {name}:")
            print("  " + line[:400])
            cm = re.search(r"calls=([%\w.\-]+)", line)
            if cm:
                comp = cm.group(1).lstrip("%")
                cpat = re.compile(
                    rf"^%?{re.escape(comp)} \(.*?^}}", re.M | re.S
                )
                body = cpat.search(hlo)
                if body:
                    lines = body.group(0).splitlines()
                    print(f"  [{len(lines)} lines]")
                    for ln in lines[-12:]:
                        print("   " + ln[:240])
            break


if __name__ == "__main__":
    main()
