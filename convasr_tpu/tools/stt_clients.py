"""Cloud STT evaluation clients: google / yandex / tinkoff / silero + self.

Behavior spec: /root/reference/scripts/stt_google.py, stt_yandex.py,
stt_tinkoff.py, stt_silero.py — each reads a transcript JSON, sends every
utterance's PCM to the vendor API, and writes the same transcript schema
back with a 'hyp' field to `<input>.<vendor>.json`, enabling side-by-side
WER comparison (vis.errors).

The 'self' vendor targets our own gRPC Google-API mock
(convasr_tpu.serve.grpc_google_api), so the same harness can benchmark this
framework against the cloud vendors. Vendor SDKs are optional; each client
raises a clear error if its dependency is missing.
"""
import argparse
import io
import json
import os

import numpy as np
import scipy.io.wavfile


def _read_pcm(audio_path):
    sample_rate, signal = scipy.io.wavfile.read(audio_path)
    assert signal.dtype == np.int16 and sample_rate in (8000, 16000), \
        (audio_path, signal.dtype, sample_rate)
    return sample_rate, signal


def recognize_self(t, endpoint='127.0.0.1:50000', lang='ru-RU', **kwargs):
    import grpc
    from ..serve import cloud_speech_pb2 as pb2
    from ..serve.grpc_google_api import make_client_stub
    sample_rate, signal = _read_pcm(t['audio_path'])
    request = pb2.RecognizeRequest()
    request.config.encoding = pb2.RecognitionConfig.LINEAR16
    request.config.sample_rate_hertz = sample_rate
    request.config.audio_channel_count = 1
    request.config.language_code = lang
    request.audio.content = signal.tobytes()
    with grpc.insecure_channel(endpoint) as channel:
        response = make_client_stub(channel)(request, timeout=600)
    return response.results[0].alternatives[0].transcript if response.results else ''


def recognize_google(t, lang='ru-RU', api_key_credentials='googleapikeycredentials.json',
                     recognition_model='phone_call', **kwargs):
    try:
        import google.cloud.speech_v1
        import google.oauth2.service_account
    except ImportError as e:
        raise RuntimeError('pip install google-cloud-speech for the google vendor') from e
    credentials = google.oauth2.service_account.Credentials.from_service_account_file(
        api_key_credentials)
    client = google.cloud.speech_v1.SpeechClient(credentials=credentials)
    sample_rate, signal = _read_pcm(t['audio_path'])
    pcm = io.BytesIO()
    scipy.io.wavfile.write(pcm, sample_rate, signal)
    res = client.recognize(
        config=dict(audio_channel_count=1, encoding='LINEAR16',
                    sample_rate_hertz=sample_rate, language_code=lang,
                    model=recognition_model),
        audio=dict(content=pcm.getvalue()))
    return res.results[0].alternatives[0].transcript if res.results else ''


def recognize_yandex(t, lang='ru-RU', api_key='yandexapikey.txt',
                     endpoint='https://stt.api.cloud.yandex.net/speech/v1/stt:recognize',
                     **kwargs):
    try:
        import requests
    except ImportError as e:
        raise RuntimeError('pip install requests for the yandex vendor') from e
    key = open(api_key).read().strip()
    sample_rate, signal = _read_pcm(t['audio_path'])
    res = requests.post(endpoint, headers=dict(Authorization='Api-Key ' + key),
                        params=dict(lang=lang, sampleRateHertz=sample_rate,
                                    format='lpcm', raw_results=True),
                        data=signal.tobytes()).json()
    return res.get('result', '')


def recognize_tinkoff(t, lang='ru-RU', api_key='tinkoffapikey.txt',
                      endpoint='https://api.tinkoff.ai/v1/stt:recognize', **kwargs):
    try:
        import requests
    except ImportError as e:
        raise RuntimeError('pip install requests for the tinkoff vendor') from e
    key = open(api_key).read().strip()
    sample_rate, signal = _read_pcm(t['audio_path'])
    import base64
    res = requests.post(
        endpoint, headers=dict(Authorization='Bearer ' + key),
        json=dict(config=dict(encoding='LINEAR16', sample_rate_hertz=sample_rate,
                              num_channels=1),
                  audio=dict(content=base64.b64encode(signal.tobytes()).decode()))).json()
    results = res.get('results', [])
    return results[0]['alternatives'][0]['transcript'] if results else ''


def recognize_silero(t, lang='ru', **kwargs):
    try:
        import torch
        model, decoder, utils = torch.hub.load('snakers4/silero-models', 'silero_stt',
                                               language=lang)
    except Exception as e:
        raise RuntimeError('silero vendor needs torch.hub access') from e
    sample_rate, signal = _read_pcm(t['audio_path'])
    out = model(torch.as_tensor(signal[None, :].astype(np.float32) / 32767.0))
    return decoder(out[0])


VENDORS = dict(self=recognize_self, google=recognize_google, yandex=recognize_yandex,
               tinkoff=recognize_tinkoff, silero=recognize_silero)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--input-path', '-i', required=True)
    parser.add_argument('--output-path', '-o', default='data')
    parser.add_argument('--vendor', default='self', choices=sorted(VENDORS))
    parser.add_argument('--lang', default='ru-RU')
    parser.add_argument('--endpoint', default='127.0.0.1:50000')
    parser.add_argument('--api-key', default=None)
    args = parser.parse_args(argv)

    recognize = VENDORS[args.vendor]
    kwargs = dict(lang=args.lang, endpoint=args.endpoint)
    if args.api_key:
        kwargs['api_key'] = args.api_key
        kwargs['api_key_credentials'] = args.api_key

    with open(args.input_path) as f:
        transcript = json.load(f)
    out = [dict(t, hyp=recognize(t, **kwargs)) for t in transcript]
    path = os.path.join(args.output_path,
                        os.path.basename(args.input_path) + f'.{args.vendor}.json')
    os.makedirs(args.output_path, exist_ok=True)
    with open(path, 'w') as f:
        json.dump(out, f, ensure_ascii=False, indent=2, sort_keys=True)
    print(path)


if __name__ == '__main__':
    main()
