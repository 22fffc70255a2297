"""Minimal chat web UI (the gradio_demo frontend replacement).

One self-contained HTML page: multi-turn chat with image upload, talking
to the stateless /generate endpoint. The conversation template (USER:/
ASSISTANT:, '\\n' separator) is rendered client-side exactly like
Conversation.get_prompt; returned image-id caches are reused so every
uploaded image is encoded once (conversation.py update_image_ids
semantics).
"""

PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>SEED-LLaMA (seed_tpu)</title>
<style>
 body{font-family:system-ui,sans-serif;max-width:780px;margin:24px auto;padding:0 12px}
 #log{border:1px solid #ccc;border-radius:8px;padding:12px;min-height:300px}
 .turn{margin:8px 0}.role{font-weight:600}
 .turn img{max-width:256px;display:block;margin:4px 0;border-radius:6px}
 #bar{display:flex;gap:8px;margin-top:12px}
 #msg{flex:1;padding:8px}
 .err{color:#b00}
</style></head><body>
<h2>SEED-LLaMA — TPU-native</h2>
<div id="log"></div>
<div id="bar">
 <input id="msg" placeholder="Message… (attach an image below)"/>
 <input id="img" type="file" accept="image/*"/>
 <button onclick="send()">Send</button>
 <button onclick="reset()">Clear</button>
</div>
<label><input id="forceimg" type="checkbox"/> force image generation</label>
<script>
const SEP = "\\n";
let turns = [];           // {role, text, images:[b64|ids]}
function esc(s){const d=document.createElement('div');d.innerText=s;return d.innerHTML}
function render(){
  const log=document.getElementById('log'); log.innerHTML='';
  for(const t of turns){
    const div=document.createElement('div'); div.className='turn';
    let html='<span class="role">'+esc(t.role)+':</span> ';
    let parts=t.text.split('<image>');
    for(let i=0;i<parts.length;i++){
      html+=esc(parts[i]);
      if(i<t.images.length){
        const im=t.images[i];
        if(typeof im==='string'&&im.length>64)
          html+='<img src="data:image/png;base64,'+im+'"/>';
        else html+='<em>[image]</em>';
      }
    }
    if(t.error) html+='<div class="err">'+esc(t.error)+'</div>';
    div.innerHTML=html; log.appendChild(div);
  }
  log.scrollTop=log.scrollHeight;
}
function prompt_body(){
  let text=''; let images=[];
  for(const t of turns){
    text+=t.role+': '+t.text+SEP;
    for(let i=0;i<t.images.length;i++)
      images.push(t.ids&&t.ids[i]?t.ids[i]:t.images[i]);
  }
  text+='ASSISTANT:';
  return {text, images};
}
async function send(){
  const msgEl=document.getElementById('msg');
  const fileEl=document.getElementById('img');
  let text=msgEl.value||''; let images=[];
  if(fileEl.files.length){
    const b64=await new Promise(r=>{const fr=new FileReader();
      fr.onload=()=>r(fr.result.split(',')[1]);fr.readAsDataURL(fileEl.files[0]);});
    images.push(b64); text+=' <image>';
  }
  turns.push({role:'USER', text, images}); render();
  msgEl.value=''; fileEl.value='';
  const body=prompt_body();
  body.force_boi=document.getElementById('forceimg').checked;
  body.max_new_tokens=256; body.top_p=0.5; body.temperature=0.7;
  try{
    const r=await fetch('/generate',{method:'POST',
      headers:{'Content-Type':'application/json'},body:JSON.stringify(body)});
    const j=await r.json();
    // back-fill id caches for prompt images, in order
    let k=0;
    for(const t of turns){ t.ids=t.ids||[];
      for(let i=0;i<t.images.length;i++){
        if(k<j.images_ids.length&&j.images_ids[k]) t.ids[i]=j.images_ids[k];
        k++; } }
    turns.push({role:'ASSISTANT', text:j.text, images:j.images,
                error:(j.error_msg||[]).join('; ')});
  }catch(e){
    turns.push({role:'ASSISTANT', text:'', images:[], error:String(e)});
  }
  render();
}
function reset(){turns=[];render();}
document.getElementById('msg').addEventListener('keydown',
  e=>{if(e.key==='Enter')send();});
</script></body></html>
"""
