"""Single-file admin console — the reference's Vue admin front
(`flink-streaming-web-front/`, views/flink: task-manage, alarm-manage,
log-manage, user-manage) rebuilt as one dependency-free HTML page
served by the REST facade (platform/rest.py) at ``/``.

The reference front is a full Vue-element-admin app talking to the
same controller verbs this facade exposes (`src/api/task.js`,
`config.js`, `alert.js`, `log.js`, `user.js`); this console keeps the
surface — job list with lifecycle buttons, SQL editor with
server-side validation, run-log / alarm / savepoint / history panels,
alarm-channel config, token login — without the build toolchain: the
container has no node, and the API is the contract worth testing.
Vanilla JS + fetch, token in localStorage, 5 s status polling."""

CONSOLE_HTML = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>spark-streaming-platform-web console</title>
<style>
 body{font-family:system-ui,sans-serif;margin:0;background:#f5f6f8;color:#222}
 header{background:#1f2d3d;color:#fff;padding:10px 18px;display:flex;
        justify-content:space-between;align-items:center}
 header h1{font-size:16px;margin:0}
 main{padding:16px;max-width:1100px;margin:auto}
 table{border-collapse:collapse;width:100%;background:#fff}
 th,td{border:1px solid #dde;padding:6px 8px;font-size:13px;text-align:left}
 th{background:#eef1f5}
 button{margin:0 2px;padding:3px 8px;font-size:12px;cursor:pointer}
 textarea{width:100%;min-height:140px;font-family:monospace;font-size:12px}
 .panel{background:#fff;border:1px solid #dde;margin:14px 0;padding:12px}
 .panel h2{font-size:14px;margin:0 0 8px}
 #msg{color:#b00;min-height:18px;font-size:13px}
 .ok{color:#080}
 input{padding:4px;margin:2px}
 pre{background:#f0f0f0;padding:8px;font-size:12px;overflow:auto;
     max-height:240px}
 .st-RUN{color:#080;font-weight:bold}.st-FAIL{color:#b00;font-weight:bold}
 .st-STOP{color:#888}.st-STARTING{color:#c80}
</style>
</head>
<body>
<header>
  <h1>spark-streaming-platform-web</h1>
  <div id="auth">
    <input id="u" placeholder="username" size="10">
    <input id="p" placeholder="password" type="password" size="10">
    <button onclick="login()">login</button>
    <button onclick="logout()">logout</button>
  </div>
</header>
<main>
<div id="msg"></div>

<div class="panel">
  <h2>Tasks <button onclick="refresh()">refresh</button></h2>
  <table id="jobs"><thead><tr>
    <th>id</th><th>name</th><th>type</th><th>status</th><th>actions</th>
  </tr></thead><tbody></tbody></table>
</div>

<div class="panel">
  <h2>New job</h2>
  <input id="jn" placeholder="job name" size="24">
  <select id="jt"><option>streaming</option><option>batch</option></select>
  <input id="ck" placeholder="checkpoint dir (optional)" size="30">
  <br><textarea id="jsql" placeholder="CREATE TABLE ...; INSERT INTO ..."></textarea><br>
  <button onclick="checkSql()">validate</button>
  <button onclick="addJob(false)">save</button>
  <button onclick="addJob(true)">save + start</button>
</div>

<div class="panel" id="detail" style="display:none">
  <h2>Job <span id="did"></span> detail <span id="dname"></span></h2>
  <textarea id="dsql"></textarea><br>
  <button onclick="checkSql('dsql')">validate</button>
  <button onclick="saveSql()">save sql</button>
  <label>alarms:
    <input id="alarms" placeholder="DINGDING,CALLBACK_URL,AUTO_START_JOB" size="34">
  </label>
  <button onclick="saveAlarms()">set</button>
  <h2>metrics</h2><pre id="dmetrics"></pre>
  <h2>run log</h2><pre id="druns"></pre>
  <h2>alarm log</h2><pre id="dalarms"></pre>
  <h2>savepoints</h2><pre id="dsp"></pre>
  <h2>sql history</h2><pre id="dhist"></pre>
</div>
</main>
<script>
const $=id=>document.getElementById(id);
const esc=s=>String(s).replace(/[&<>"']/g,
  c=>({"&":"&amp;","<":"&lt;",">":"&gt;",'"':"&quot;","'":"&#39;"}[c]));
const tok=()=>localStorage.getItem("token")||"";
async function api(path,body){
  const opt=body!==undefined
    ?{method:"POST",headers:{token:tok(),"Content-Type":"application/json"},
      body:JSON.stringify(body)}
    :{headers:{token:tok()}};
  const r=await fetch(path,opt);
  const j=await r.json();
  if(j.code!==200){throw new Error(j.message)}
  return j.data;
}
function say(t,ok){$("msg").textContent=t;$("msg").className=ok?"ok":""}
async function login(){
  try{const d=await api("/api/login",{username:$("u").value,
      password:$("p").value});
    localStorage.setItem("token",d.token);say("logged in",true);refresh();
  }catch(e){say(e.message)}
}
async function logout(){try{await api("/api/logout",{})}catch(e){}
  localStorage.removeItem("token");say("logged out",true)}
async function refresh(){
  try{
    const jobs=await api("/api/listTask");
    const tb=$("jobs").querySelector("tbody");tb.innerHTML="";
    for(const j of jobs){
      const tr=document.createElement("tr");
      tr.innerHTML=`<td>${j.id}</td><td>${esc(j.job_name)}</td>
        <td>${esc(j.job_type)}</td>
        <td class="st-${j.status}">${j.status}</td>
        <td>
         <button onclick="act('start',${j.id})">start</button>
         <button onclick="act('stop',${j.id})">stop</button>
         <button onclick="act('savepoint',${j.id})">savepoint</button>
         <button onclick="act('open',${j.id})">open</button>
         <button onclick="act('close',${j.id})">close</button>
         <button onclick="act('copyConfig',${j.id})">copy</button>
         <button onclick="act('delete',${j.id})">delete</button>
         <button data-id="${j.id}" class="btn-detail">detail</button>
        </td>`;
      tr.querySelector(".btn-detail").onclick=
        ()=>detail(j.id, j.job_name);
      tb.appendChild(tr);
    }
    say("",true);
  }catch(e){say(e.message)}
}
async function act(verb,id){
  try{await api("/api/"+verb,{id});say(verb+" ok",true);refresh()}
  catch(e){say(verb+": "+e.message)}
}
async function checkSql(src){
  try{const d=await api("/api/checkfSql",
      {sql:$(src||"jsql").value,job_type:$("jt").value});
    say(d.ok?"sql ok":"invalid: "+d.errors.join("; "),d.ok)}
  catch(e){say(e.message)}
}
async function addJob(start){
  try{
    const b={name:$("jn").value,sql:$("jsql").value,
             job_type:$("jt").value};
    if($("ck").value)b.checkpoint_dir=$("ck").value;
    const d=await api(start?"/api/deployFlinkTask":"/api/addConfig",b);
    say("job "+d.id+(start?" started":" saved"),true);refresh();
  }catch(e){say(e.message)}
}
let cur=null;
async function detail(id,name){
  cur=id;$("detail").style.display="block";
  $("did").textContent=id;$("dname").textContent=name;
  try{
    const hist=await api(`/api/jobConfigHistoryPage?id=${id}`);
    $("dhist").textContent=hist.map(h=>`v${h.version}:\\n${h.sql}`)
      .join("\\n---\\n")||"(none)";
    if(hist.length)$("dsql").value=hist[hist.length-1].sql;
    $("dmetrics").textContent=
      JSON.stringify(await api(`/api/metrics?id=${id}`),null,1);
    $("druns").textContent=
      JSON.stringify(await api(`/api/runLog?id=${id}`),null,1);
    $("dalarms").textContent=
      JSON.stringify(await api(`/api/alarmLog?id=${id}`),null,1);
    $("dsp").textContent=
      JSON.stringify(await api(`/api/savepoints?id=${id}`),null,1);
  }catch(e){say(e.message)}
}
async function saveSql(){
  try{await api("/api/editConfig",{id:cur,sql:$("dsql").value});
    say("sql saved",true)}catch(e){say(e.message)}
}
async function saveAlarms(){
  try{await api("/api/setAlarmConfig",
    {id:cur,types:$("alarms").value.split(",").map(s=>s.trim())
      .filter(Boolean)});
    say("alarms set",true)}catch(e){say(e.message)}
}
refresh();setInterval(refresh,5000);
</script>
</body>
</html>
"""
