"""Format tools/accuracy_ab.py JSON outputs as the README markdown table."""
import json
import sys


def fmt(x, nd=3):
    return f'{x:.{nd}f}'


def main(train_json, act_json=None):
    with open(train_json) as f:
        tr = json.load(f)
    res = tr['results']
    multi_seed = 'per_seed' in res['dense']   # round-5 multi-seed schema
    if multi_seed:
        dense = res['dense']['per_seed'][0]['eval_dense_parity']
        seeds = tr.get('seeds', [0])
        print(f"Trained for {tr['steps']} steps x {len(seeds)} seeds on the "
              f"learnable synthetic set ({tr['n_train']} train / "
              f"{tr['n_val']} val scripted scenes), full eval protocol "
              f"(zero-noise, host instance matching); mean +- seed sd:\n")
        print('| trained with | IoU mean +- sd | VPQ mean +- sd |')
        print('|---|---|---|')
        for mode, row in res.items():
            if mode == 'dense_trained_cross_serving':
                continue
            i, v = row['iou_matched'], row['vpq_matched']
            print(f"| {mode} | {fmt(i['mean'])} +- {fmt(i['sd'])} "
                  f"| {fmt(v['mean'])} +- {fmt(v['sd'])} |")
    else:
        dense = res['dense']['eval_dense_parity']
        print(f"Trained from one shared init for {tr['steps']} steps on the "
              f"learnable synthetic set ({tr['n_train']} train / {tr['n_val']} "
              f"val scripted scenes), evaluated with the full protocol "
              f"(zero-noise, host instance matching):\n")
        print('| trained with | served with its own config (IoU / VPQ) | '
              'served dense (IoU / VPQ) |')
        print('|---|---|---|')
        for mode, row in res.items():
            if mode == 'dense_trained_cross_serving':
                continue
            m, d = row['eval_matched'], row['eval_dense_parity']
            print(f"| {mode} | {fmt(m['iou'])} / {fmt(m['vpq'])} "
                  f"| {fmt(d['iou'])} / {fmt(d['vpq'])} |")
    print('\nDense-trained checkpoint cross-served with each lever '
          '(the pure serving-lever case):\n')
    print('| served with | IoU | VPQ | ΔIoU vs dense-served |')
    print('|---|---|---|---|')
    for serve, row in res['dense_trained_cross_serving'].items():
        print(f"| {serve} | {fmt(row['iou'])} | {fmt(row['vpq'])} "
              f"| {row['iou'] - dense['iou']:+.3f} |")
    if act_json:
        with open(act_json) as f:
            act = json.load(f)
        print('\nActivation-error study (BEV features / seg logits, relative '
              'to the global max, dense reference):\n')
        print('| state | depth entropy p50 (nats) | top-8 mass p50 | lever | '
              'BEV err p50 / p99 | seg-logit err p50 / p99 |')
        print('|---|---|---|---|---|---|')
        for tag, row in act.items():
            ent = row['depth_entropy_nats']
            mass = row['top8_captured_mass']
            for lever in ['topk8', 'warpfree', 'topk8_warpfree']:
                bev = row[f'bev_feature_rel_err_{lever}']
                seg = row.get(f'seg_logit_rel_err_{lever}')
                segtxt = (f"{fmt(seg['p50'], 4)} / {fmt(seg['p99'], 4)}"
                          if seg else '—')
                print(f"| {tag} | {fmt(ent['p50'], 2)} | {fmt(mass['p50'], 3)} "
                      f"| {lever} | {fmt(bev['p50'], 4)} / {fmt(bev['p99'], 4)} "
                      f"| {segtxt} |")


if __name__ == '__main__':
    main(*sys.argv[1:])
