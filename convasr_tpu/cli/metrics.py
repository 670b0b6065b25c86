"""Metric CLIs: analyze / analyze-file / align.

Behavior spec: /root/reference/metrics.py:648-756 (cmd_analyze,
cmd_analyze_file, cmd_align + argparse).
"""
import argparse
import json
import os

from ..metrics import ErrorAnalyzer, ErrorTagger, WordTagger, align_strings, align_words
from ..text import ProcessingPipeline, TextPostprocessor


def _build_analyzer(val_config, text_config, vocab):
    assert os.path.exists(text_config), text_config
    config = ProcessingPipeline.load_config(text_config)
    postprocessors = {name: TextPostprocessor(**cfg)
                      for name, cfg in config['postprocess'].items()}
    vocab_set = set(map(str.strip, open(vocab))) if vocab and os.path.exists(vocab) else set()
    if val_config and os.path.exists(val_config):
        with open(val_config) as f:
            vc = json.load(f)
        analyzer_configs, word_tags = vc['error_analyzer'], vc['word_tags']
    else:
        analyzer_configs, word_tags = {}, {}
    return ErrorAnalyzer(word_tagger=WordTagger(word_tags=word_tags, vocab=vocab_set),
                         error_tagger=ErrorTagger(), configs=analyzer_configs,
                         postprocessors=postprocessors), config


def cmd_analyze(hyp, ref, val_config, text_config, text_pipeline_name, vocab, detailed):
    analyzer, config = _build_analyzer(val_config, text_config, vocab)
    pipeline = ProcessingPipeline.make(config, text_pipeline_name)
    report = analyzer.analyze(hyp=hyp, ref=ref, postprocess_fn=pipeline.postprocess,
                              detailed=detailed)
    print(json.dumps(report, ensure_ascii=False, indent=2, sort_keys=True))


def cmd_analyze_file(input_file, output_file, val_config, text_config,
                     text_pipeline_name, vocab, detailed, aggregate_metrics):
    analyzer, config = _build_analyzer(val_config, text_config, vocab)
    pipeline = ProcessingPipeline.make(config, text_pipeline_name)
    with open(input_file) as f:
        pairs = json.load(f)
    reports = [analyzer.analyze(hyp=t['hyp'], ref=t['ref'],
                                postprocess_fn=pipeline.postprocess, detailed=detailed,
                                extra={'audio_path': t.get('audio_path', '')})
               for t in pairs]
    if output_file:
        with open(output_file, 'w') as f:
            json.dump(reports, f, ensure_ascii=False, indent=2, sort_keys=True)
        print(output_file)
    if aggregate_metrics:
        print('\nAggregated metrics:')
        for name in aggregate_metrics:
            print(name, sum(t[name] for t in reports) / len(reports))


def cmd_align(hyp, ref):
    aligned = align_strings(hyp=hyp, ref=ref)
    print('\n'.join(f'{k}: {v}' for k, v in zip(['hyp', 'ref'], aligned)))
    print('\n'.join(map(str, align_words(*aligned))))


def build_parser():
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest='cmd', required=True)

    c = sub.add_parser('analyze')
    c.add_argument('--hyp', required=True)
    c.add_argument('--ref', required=True)
    c.add_argument('--val-config', default='configs/ru_val_config.json')
    c.add_argument('--text-config', default='configs/ru_text_config.json')
    c.add_argument('--pipeline', dest='text_pipeline_name', default='char_legacy')
    c.add_argument('--vocab', default='data/vocab_word_list.txt')
    c.add_argument('--detailed', action='store_true')
    c.set_defaults(func=cmd_analyze)

    c = sub.add_parser('analyze-file')
    c.add_argument('--input-file', required=True)
    c.add_argument('--output-file')
    c.add_argument('--val-config', default='configs/ru_val_config.json')
    c.add_argument('--text-config', default='configs/ru_text_config.json')
    c.add_argument('--pipeline', dest='text_pipeline_name', default='char_legacy')
    c.add_argument('--vocab', default='data/vocab_word_list.txt')
    c.add_argument('--detailed', action='store_true')
    c.add_argument('--aggregate-metrics', nargs='*', default=['cer', 'wer'])
    c.set_defaults(func=cmd_analyze_file)

    c = sub.add_parser('align')
    c.add_argument('--hyp', required=True)
    c.add_argument('--ref', required=True)
    c.set_defaults(func=cmd_align)
    return parser


def main(argv=None):
    args = vars(build_parser().parse_args(argv))
    args.pop('cmd')
    func = args.pop('func')
    func(**args)


if __name__ == '__main__':
    main()
