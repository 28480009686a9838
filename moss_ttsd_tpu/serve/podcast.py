"""Podcast generation pipeline: URL / PDF / TXT -> dialogue script -> audio.

Equivalent of reference podcast_generate.py: extract source text, ask an
LLM (OpenAI-compatible chat endpoint, via requests) to write a two-speaker
podcast script in [S1]/[S2] format with zh/en prompt templates, then synthesize
with fixed per-language prompt voices through the local pipeline.
"""

from __future__ import annotations

import json
import os
import re
from typing import Optional

# fixed per-language prompt voices (reference podcast_generate.py:19-29)
DEFAULT_VOICES = {
    "zh": {"prompt_audio_speaker1": "examples/zh_spk1_moon.wav",
           "prompt_text_speaker1": "周一到周五，每天早晨七点半到九点半的直播片段。"
                                   "言下之意呢，就是废话有点多，大家也别嫌弃。",
           "prompt_audio_speaker2": "examples/zh_spk2_moon.wav",
           "prompt_text_speaker2": "如果大家想听到更丰富更及时的直播内容，记得准时进入直播间。"},
    "en": {"prompt_audio_speaker1": "examples/m1.wav",
           "prompt_text_speaker1": "How much do you know about her?",
           "prompt_audio_speaker2": "examples/m2.wav",
           "prompt_text_speaker2": "Well, we know this much about her."},
}

SCRIPT_PROMPT_ZH = """你是一位专业的播客编剧。请将下面的材料改写成一段两人对谈的中文播客脚本。
要求：
1. 使用 [S1] 和 [S2] 标注两位主持人的每一句话，两人交替自然对话；
2. 口语化表达，包含适当的语气词（嗯、诶、对对对）和互动；
3. 完整覆盖材料的核心信息，总长度适合 5-10 分钟的节目；
4. 只输出脚本本身，不要任何其他说明。
材料：
{content}"""

SCRIPT_PROMPT_EN = """You are a professional podcast scriptwriter. Turn the \
material below into a two-host English podcast script.
Requirements:
1. Tag every utterance with [S1] or [S2]; the hosts alternate naturally.
2. Conversational tone with fillers (um, right, exactly) and interaction.
3. Cover the material's core information; length suitable for 5-10 minutes.
4. Output only the script, nothing else.
Material:
{content}"""

FALLBACK_SCRIPT_ZH = ("[S1]欢迎收听本期节目。今天我们聊的材料内容非常有意思。"
                      "[S2]是的，虽然自动脚本生成暂时不可用，我们还是为大家准备了这段演示。"
                      "[S1]感谢收听，我们下期再见。")
FALLBACK_SCRIPT_EN = ("[S1]Welcome to the show. Today's material was really "
                      "interesting. [S2]Indeed — although automatic script "
                      "generation was unavailable, here is a short demo. "
                      "[S1]Thanks for listening.")


# -- source extraction (reference podcast_generate.py:35-219) ---------------

def extract_text_from_txt(path: str) -> str:
    with open(path, encoding="utf-8", errors="replace") as f:
        return f.read()


def extract_text_from_pdf(path: str) -> str:
    try:
        import PyPDF2
    except ImportError as e:
        raise ImportError("PyPDF2 not installed; cannot extract PDF text") from e
    out = []
    with open(path, "rb") as f:
        reader = PyPDF2.PdfReader(f)
        for page in reader.pages:
            out.append(page.extract_text() or "")
    return "\n".join(out)


def extract_web_content(url: str) -> str:
    import requests
    from bs4 import BeautifulSoup
    r = requests.get(url, timeout=30,
                     headers={"User-Agent": "Mozilla/5.0 (podcast-bot)"})
    r.raise_for_status()
    soup = BeautifulSoup(r.text, "html.parser")
    for tag in soup(["script", "style", "nav", "header", "footer"]):
        tag.decompose()
    text = soup.get_text(separator="\n")
    lines = [l.strip() for l in text.splitlines() if l.strip()]
    return "\n".join(lines)


def parse_input_content(source: str) -> str:
    """URL / .pdf / .txt / raw text -> extracted text
    (reference parse_input_content, podcast_generate.py:171-219)."""
    if re.match(r"^https?://", source):
        return extract_web_content(source)
    if source.lower().endswith(".pdf") and os.path.exists(source):
        return extract_text_from_pdf(source)
    if source.lower().endswith(".txt") and os.path.exists(source):
        return extract_text_from_txt(source)
    return source


# -- script generation (reference podcast_generate.py:224-353) --------------

def generate_podcast_script(content: str, language: str = "zh",
                            base_url: Optional[str] = None,
                            api_key: Optional[str] = None,
                            model: str = "gemini-2.5-pro",
                            max_content_chars: int = 50_000) -> str:
    """Ask an OpenAI-compatible chat endpoint to write the dialogue script;
    falls back to a sample script on failure (reference :348-353)."""
    template = SCRIPT_PROMPT_ZH if language == "zh" else SCRIPT_PROMPT_EN
    prompt = template.format(content=content[:max_content_chars])
    base_url = base_url or os.environ.get("PODCAST_LLM_BASE")
    api_key = api_key or os.environ.get("PODCAST_LLM_KEY", "")
    if base_url:
        try:
            import requests
            r = requests.post(
                f"{base_url.rstrip('/')}/chat/completions",
                json={"model": model,
                      "messages": [{"role": "user", "content": prompt}]},
                headers={"Authorization": f"Bearer {api_key}"} if api_key else {},
                timeout=300)
            r.raise_for_status()
            script = r.json()["choices"][0]["message"]["content"].strip()
            if "[S1]" in script:
                return script
            print("LLM response missing [S1] tags; using fallback")
        except Exception as e:
            print(f"script generation failed ({e}); using fallback")
    return FALLBACK_SCRIPT_ZH if language == "zh" else FALLBACK_SCRIPT_EN


def detect_language(text: str) -> str:
    zh = len(re.findall(r"[一-鿿]", text))
    return "zh" if zh > len(text) * 0.1 else "en"


# -- end-to-end (reference process_input_to_audio, :358-446) ----------------

def process_input_to_audio(source: str, pipe, output_path: str,
                           language: Optional[str] = None,
                           voices: Optional[dict] = None,
                           base_path: str = "/root/reference",
                           use_normalize: bool = True, seed: int = 0,
                           llm_base_url: Optional[str] = None,
                           llm_api_key: Optional[str] = None) -> dict:
    """Long-form synthesis as ONE generation with voice cloning (the
    reference's long-session strategy, SURVEY.md §3.5)."""
    from ..utils.audio_io import write_wav
    content = parse_input_content(source)
    language = language or detect_language(content)
    script = generate_podcast_script(content, language, llm_base_url,
                                     llm_api_key)
    voice = dict(voices or DEFAULT_VOICES[language])
    item = {"base_path": base_path, "text": script, **voice}
    texts_data, audio_results = pipe.process_batch(
        [item], use_normalize=use_normalize, seed=seed)
    if not audio_results or audio_results[0] is None:
        raise RuntimeError("synthesis produced no audio")
    res = audio_results[0]
    write_wav(output_path, res["audio_data"], res["sample_rate"])
    return {"script": script, "language": language, "output": output_path,
            "duration_s": res["audio_data"].shape[-1] / res["sample_rate"]}


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(description="Podcast generation (TPU)")
    p.add_argument("--input", required=True, help="URL, .pdf, .txt, or raw text")
    p.add_argument("--output", default="podcast.wav")
    p.add_argument("--language", choices=["zh", "en"], default=None)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--model_path", default=None)
    p.add_argument("--spt_config", default=None)
    p.add_argument("--spt_ckpt", default=None)
    args = p.parse_args(argv)
    if args.tiny or not args.model_path:
        from ..cli.inference import build_tiny_pipeline
        pipe = build_tiny_pipeline()
    else:
        from ..pipeline.batch import TTSPipeline
        pipe = TTSPipeline.load(args.model_path, args.spt_config, args.spt_ckpt)
    info = process_input_to_audio(args.input, pipe, args.output,
                                  language=args.language)
    print(json.dumps({k: v for k, v in info.items() if k != "script"},
                     ensure_ascii=False))
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
